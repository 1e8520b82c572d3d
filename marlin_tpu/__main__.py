"""`python -m marlin_tpu` → marlin_tpu.main (single CLI implementation)."""

import sys

from .main import main

if __name__ == "__main__":
    sys.exit(main())

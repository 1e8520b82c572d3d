"""Docs completeness: every registered deck type must resolve to a prose
page — either its own docs/types/<Name>.md or a family page via the
generator's GROUP_PAGES map (the analog of the reference's one-page-per-
class doc/content/source tree)."""

import importlib
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TYPES_DIR = os.path.join(ROOT, "docs", "types")


def _all_registered():
    for mod in ("marlin_tpu.problem", "marlin_tpu.solvers",
                "marlin_tpu.computes", "marlin_tpu.postprocessors",
                "marlin_tpu.outputs", "marlin_tpu.stencils",
                "marlin_tpu.aux"):
        importlib.import_module(mod)
    from marlin_tpu import registry

    names = set()
    for rname in ("computes", "solvers", "predictors", "postprocessors",
                  "outputs", "stencils", "user_objects"):
        names.update(getattr(registry, rname)._classes)
    return names


def test_every_type_has_a_prose_page():
    sys.path.insert(0, os.path.join(ROOT, "docs"))
    try:
        from generate_syntax import GROUP_PAGES
    finally:
        sys.path.pop(0)

    missing, broken = [], []
    for name in sorted(_all_registered()):
        own = os.path.join(TYPES_DIR, f"{name}.md")
        if os.path.exists(own):
            continue
        page = GROUP_PAGES.get(name)
        if page is None:
            missing.append(name)
        elif not os.path.exists(os.path.join(TYPES_DIR, page)):
            broken.append(f"{name} -> {page}")
    assert not missing, f"types with no prose page: {missing}"
    assert not broken, f"GROUP_PAGES targets that do not exist: {broken}"


def test_group_pages_mention_their_types():
    """A family page must actually talk about each type routed to it."""
    sys.path.insert(0, os.path.join(ROOT, "docs"))
    try:
        from generate_syntax import GROUP_PAGES
    finally:
        sys.path.pop(0)

    silent = []
    for name, page in GROUP_PAGES.items():
        path = os.path.join(TYPES_DIR, page)
        if not os.path.exists(path):
            continue  # covered by the other test
        with open(path) as f:
            if name not in f.read():
                silent.append(f"{name} not mentioned in {page}")
    assert not silent, silent

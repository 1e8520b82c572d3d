"""FFT micromechanics computes (deGeus-style). Populated in a later milestone."""

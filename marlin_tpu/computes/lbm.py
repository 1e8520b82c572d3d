"""Lattice Boltzmann computes. Populated in a later milestone."""

"""Graph generators (R-MAT / Erdős–Rényi) — TPU-native, stateless PRNG."""

"""TPU compute path: moment system, preprocessing, Pallas kernels (L1-L3)."""

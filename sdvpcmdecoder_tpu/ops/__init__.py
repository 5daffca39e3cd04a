"""Device kernels: binarizer trial grid, deinterleave + ECC, histograms."""

"""Dense compute kernels (numpy host / JAX device / Pallas TPU)."""

"""Low-level geometry/math ops — pure JAX, jit-friendly, fixed-shape."""

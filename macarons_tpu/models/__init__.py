"""Neural network models (flax.linen), TPU-first rebuilds of the reference nets."""

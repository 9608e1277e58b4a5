"""Parallelism: device meshes, shardings, collectives (replaces DDP/NCCL)."""

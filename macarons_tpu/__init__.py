"""macarons_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of MACARONS/SCONE.

A self-supervised Next-Best-View (NBV) framework: multi-frame monocular depth with
photometric self-supervision, depth-to-point-cloud mapping into a fixed-shape masked
voxel scene store, a transformer occupancy-probability field over proxy points, and a
spherical-harmonics surface-coverage-gain model scoring all candidate cameras in one
fused batched device launch.

Reference capabilities: Anttwo/MACARONS (CVPR 2023) + SCONE (NeurIPS 2022).
This is a ground-up TPU-first design, not a port — see SURVEY.md.
"""

__version__ = "0.1.0"

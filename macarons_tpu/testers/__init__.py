"""Evaluation entry points: ShapeNet NBV and full scene exploration."""

"""Distributed layer: device meshes, shardings, collectives helpers."""

from . import mesh
from .mesh import (
    create_hybrid_mesh,
    create_mesh,
    initialize_distributed,
    shard_batch,
    shard_params,
)

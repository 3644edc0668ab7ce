"""Distributed layer: device meshes, shardings, collectives helpers."""

from . import mesh
from .mesh import create_mesh, shard_batch, shard_params, initialize_distributed

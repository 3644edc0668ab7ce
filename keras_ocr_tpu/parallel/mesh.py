"""Device mesh construction and sharding helpers.

The distributed layer of the framework: replaces the reference's only
parallelism primitive — ``tf.distribute.MirroredStrategy`` single-host
data parallelism with NCCL all-reduce
(/root/reference/scripts/train_recognizer_synthtext90_multigpu.py:129-137)
— with ``jax.sharding.Mesh`` + ``NamedSharding``. Axes:

* ``data``: batch (data-parallel) axis; gradients are reduced by XLA
  collectives over ICI automatically when params are replicated and the
  batch is sharded.
* ``model``: tensor-parallel axis for wide layers (column-parallel dense
  kernels). The CRAFT/CRNN models are small (~20M/8.7M params) so DP is
  the production configuration (model=1), but the axis exists so large
  batches / custom variants can shard — the SURVEY §2c design.

Multi-host initialization (ICI within a slice, DCN across slices) goes
through :func:`initialize_distributed`.
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Initialize multi-host JAX (jax.distributed). No-op if single-host."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def create_mesh(
    shape: typing.Optional[typing.Tuple[int, int]] = None,
    axis_names: typing.Tuple[str, str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Default: all devices on the data axis (pure DP), model axis size 1.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    grid = np.asarray(devices).reshape(shape)
    return Mesh(grid, axis_names)


def create_hybrid_mesh(
    dcn_data: int = 1,
    ici_shape: typing.Optional[typing.Tuple[int, int]] = None,
    axis_names: typing.Tuple[str, ...] = ("slice", "data", "model"),
    devices=None,
) -> Mesh:
    """(slice, data, model) mesh for multi-slice TPU pods.

    Data parallelism is split hierarchically: the outer ``slice`` axis
    maps onto DCN (slow inter-slice network, gradient all-reduce only)
    and the inner ``data``/``model`` axes onto ICI, so collectives that
    run every step ride the fast fabric — the SURVEY §2c DCN/ICI layering
    (scaling-book recipe). Falls back to a trivial slice axis of size 1
    on single-slice (or CPU) platforms, so the same program shape works
    everywhere.

    Args:
        dcn_data: number of slices (DCN-connected groups).
        ici_shape: (data, model) shape within one slice; default = all
            local devices on data.
    """
    if devices is None:
        devices = jax.devices()
    per_slice = len(devices) // dcn_data
    if ici_shape is None:
        ici_shape = (per_slice, 1)
    if dcn_data > 1 and hasattr(devices[0], "slice_index"):
        from jax.experimental import mesh_utils

        # mesh_shape is the per-slice (ICI) grid, dcn_mesh_shape the
        # across-slice factors; result = (slice, data, model) directly.
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1,) + tuple(ici_shape),
            dcn_mesh_shape=(dcn_data, 1, 1),
            devices=devices,
        )
    else:
        # CPU simulation (fake devices have no slice topology) or a
        # single slice: contiguous grouping stands in for the DCN axis.
        grid = np.asarray(devices).reshape((dcn_data,) + tuple(ici_shape))
    return Mesh(grid, axis_names)


def hybrid_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the batch over both DCN (slice) and ICI (data) data axes."""
    return NamedSharding(mesh, P(("slice", "data")))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over all data-parallel axes.

    On a hybrid multi-slice mesh the batch splits over (slice, data) —
    DCN only ever carries the gradient all-reduce, never activations.
    """
    if "slice" in mesh.axis_names:
        return hybrid_batch_sharding(mesh)
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of batch arrays with the batch axis sharded on data."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard an NHWC image batch: batch on ``data``, HEIGHT on ``model``.

    The SURVEY §2c "closest analog to context parallelism" for this
    workload: convolutions over a spatially-partitioned input. XLA's SPMD
    partitioner inserts the halo exchanges (collective-permutes of the
    kernel-support rows over ICI) automatically, so hi-res images can run
    across chips without any model change.
    """
    return NamedSharding(mesh, P("data", "model"))


def crnn_param_sharding(mesh: Mesh):
    """Tensor-parallel sharding rules for CRNN parameters.

    Column-parallel on the wide dense/LSTM kernels (output-feature axis on
    ``model``); everything else replicated. With ``model`` axis size 1
    this degenerates to pure replication (the DP production config).
    """

    model_size = mesh.shape["model"]

    def spec_for(path: typing.Tuple[str, ...], leaf) -> NamedSharding:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if (
            leaf.ndim == 2
            and leaf.shape[1] % model_size == 0
            and (
                "fc_9/kernel" in name
                or "fc_12/kernel" in name
                or ("lstm" in name and name.endswith("kernel"))
            )
        ):
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    def apply(tree):
        return jax.tree_util.tree_map_with_path(spec_for, tree)

    return apply


def shard_params(variables, mesh: Mesh, rules=None):
    """Device_put a variable tree according to sharding rules (default:
    replicate everything; pass :func:`crnn_param_sharding` for TP).

    Always returns fresh buffers: when the sharding already matches,
    ``device_put`` returns an array that shares the underlying buffer.
    Trainers donate these buffers into their jitted step, and donating an
    alias of the caller's model variables would delete them out from under
    the model (one-time copy cost at trainer init, ≤80 MB here).
    """

    def put(x, sharding):
        return jax.device_put(jnp.array(x, copy=True), sharding)

    if rules is None:
        sharding = replicated(mesh)
        return jax.tree.map(lambda x: put(x, sharding), variables)
    specs = rules(variables)
    return jax.tree.map(put, variables, specs)

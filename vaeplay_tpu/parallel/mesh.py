"""Device mesh construction and sharding rules.

The reference is single-GPU (every trainer pins one device via `.cuda(args.gpu)`,
e.g. train_BE.py:129); scaling here is first-class instead: a ("data", "model")
mesh with batch sharding along "data" as the primary axis (SURVEY.md §2.3) and
optional tensor sharding of large dense layers along "model".  All collectives
are inserted by XLA from sharding annotations and ride ICI.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    Defaults to all devices on the data axis — the right layout for these
    small-model, large-batch workloads where DP is the primary scaling axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def parse_mesh_arg(spec: Optional[str]) -> Mesh:
    """Build a mesh from a CLI "--mesh DxM" string (data x model axes), e.g.
    "4x2"; None/empty → all devices on the data axis."""
    if not spec:
        return create_mesh()
    nd, nm = (int(p) for p in spec.lower().replace("*", "x").split("x"))
    return create_mesh(n_data=nd, n_model=nm)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding along the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded over "data"."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params / opt state) across the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def infer_param_sharding(mesh: Mesh, params, min_dim: int = 1024):
    """Tensor-parallel sharding rule: shard the last (output-features) axis of
    any kernel whose last dim is large and divisible by the model-axis size;
    replicate everything else.  Applied as NamedShardings, XLA/GSPMD inserts
    the all-gathers/reduce-scatters over ICI automatically.
    """
    n_model = mesh.shape["model"]

    def rule(x):
        if (
            n_model > 1
            and hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[-1] >= min_dim
            and x.shape[-1] % n_model == 0
        ):
            spec = [None] * (x.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_params(mesh: Mesh, params, min_dim: int = 1024):
    """Place params according to infer_param_sharding."""
    shardings = infer_param_sharding(mesh, params, min_dim)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)

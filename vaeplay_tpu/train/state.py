"""Multi-optimizer train state.

The reference trainers run up to five retained backward passes feeding two to
four independent optimizers over disjoint parameter subsets (train.py:68-78,
train_BE_font.py:280-282, train_Style_GAN.py:337-339).  Because torch's
`.grad` accumulates across those backwards and each optimizer only reads its
own subset, the whole scheme is equivalent to: one gradient of the *sum* of
the losses, routed through per-subset optimizers.  That is exactly what
`MultiOptState` encodes — one `optax.multi_transform` keyed by the top-level
parameter group (flax submodule name), applied inside a single jit step.
"""

from typing import Any, Callable, Dict, Mapping

import jax
import optax
from flax import struct
from flax.core import FrozenDict


def torch_rmsprop(lr: float, alpha: float = 0.99, eps: float = 1e-8):
    """optax transform matching torch.optim.RMSprop defaults:
    sq = alpha*sq + (1-alpha)*g^2 ; p -= lr * g / (sqrt(sq) + eps)."""
    return optax.rmsprop(lr, decay=alpha, eps=eps, eps_in_sqrt=False)


def torch_adam(lr: float, betas=(0.9, 0.999), eps: float = 1e-8):
    """optax transform matching torch.optim.Adam (bias-corrected)."""
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


class TrainState(struct.PyTreeNode):
    """Functional train state: params + mutable collections + optimizer state."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    constants: Any  # non-trainable stored stats (e.g. FrozenBatchNorm)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx, constants=None):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            constants={} if constants is None else constants,
            tx=tx,
            apply_fn=apply_fn,
        )

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        if self.constants:
            v["constants"] = self.constants
        return v

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )


def path_labeled_transform(
    label_fn: Callable[[tuple], str],
    group_txs: Mapping[str, optax.GradientTransformation],
    params,
) -> optax.GradientTransformation:
    """optax.multi_transform with labels computed from each param's full path
    (tuple of nested dict keys).  Used e.g. to freeze torchvision backbone
    stem/layer1 (trainable_layers=3 semantics) while Adam-training the rest."""
    from flax import traverse_util

    def label_tree(p):
        flat = traverse_util.flatten_dict(p)
        labels = {k: label_fn(k) for k in flat}
        return traverse_util.unflatten_dict(labels)

    return optax.multi_transform(dict(group_txs), label_tree)


def _is_frozen_backbone_path(parts) -> bool:
    """torchvision resnet_fpn_backbone trainable_layers=3 rule: the stem
    ("conv1") and "layer1" under the backbone body are frozen."""
    if "body" in parts:
        i = parts.index("body")
        nxt = parts[i + 1] if i + 1 < len(parts) else ""
        return nxt == "conv1" or nxt.startswith("layer1_")
    return False


def frozen_backbone_adam(lr: float, betas=(0.9, 0.999),
                         frozen_prefixes=("backbone", "body")) -> optax.GradientTransformation:
    """Adam everywhere except params whose path contains the torchvision
    frozen stem ("conv1"/"bn1") or "layer1" under the backbone body."""

    def label(path: tuple) -> str:
        parts = [str(p) for p in path]
        return "frozen" if _is_frozen_backbone_path(parts) else "train"

    return path_labeled_transform(
        label, {"train": torch_adam(lr, betas), "frozen": optax.set_to_zero()},
        None,
    )


def stop_frozen_gradients(params):
    """stop_gradient over the torchvision-frozen backbone subtrees (the same
    paths frozen_backbone_adam maps to set_to_zero).

    The optimizer mask already discards those gradients, so cutting them at
    the apply boundary changes no update — but it lets XLA dead-code both the
    frozen weight-gradient computations AND the activation backprop through
    conv1/layer1 (nothing upstream of the stem is differentiated), which run
    at the backbone's highest spatial resolutions.  Call INSIDE the loss
    function, on the traced params."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    out = {
        k: (jax.lax.stop_gradient(v)
            if _is_frozen_backbone_path([str(p) for p in k]) else v)
        for k, v in flat.items()
    }
    return traverse_util.unflatten_dict(out)


def grouped_transform(group_txs: Mapping[str, optax.GradientTransformation], params) -> optax.GradientTransformation:
    """Build one transform applying a per-group optimizer, where the group of a
    parameter is its top-level key in the params dict (the flax submodule
    name, e.g. "encoder" / "decoder" / "discriminator" / "param_encoder")."""

    def label_tree(p):
        return {k: jax.tree_util.tree_map(lambda _: k, v) for k, v in p.items()}

    missing = set(dict(params).keys()) - set(group_txs.keys())
    assert not missing, f"no optimizer for param groups {missing}"
    return optax.multi_transform(dict(group_txs), label_tree)

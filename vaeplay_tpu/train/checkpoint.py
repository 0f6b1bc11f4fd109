"""Checkpointing — orbax pytree checkpoints with the reference's run layout.

The reference torch.saves whole pickled nn.Modules per epoch into
logs/<FAMILY>/<YYYYmmdd-HHMMSS>/<epoch>.ckpt with no resume path
(train_BE.py:100-105,136-143).  Here checkpoints are pytrees of
{params, batch_stats, opt_state, step, epoch} with full save+resume, kept in
the same run-dir layout so tooling that walks logs/<family>/<ts>/ still works.
"""

import datetime
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp
from flax import serialization

from vaeplay_tpu.utils.viz import makedirs


def make_run_dir(root: str, family: str, timestamp: Optional[str] = None) -> str:
    """logs/<FAMILY>/<YYYYmmdd-HHMMSS>/ (reference train_BE.py:100-105)."""
    ts = timestamp or datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    path = os.path.join(root, family, ts)
    makedirs(path)
    return path


class Checkpointer:
    """Thin orbax wrapper: save(step, tree) / restore(step) / latest()."""

    def __init__(self, run_dir: str):
        self.run_dir = os.path.abspath(run_dir)
        makedirs(self.run_dir)
        self._ckptr = ocp.PyTreeCheckpointer()

    def path(self, tag) -> str:
        return os.path.join(self.run_dir, str(tag))

    def save(self, tag, tree: Any) -> str:
        p = self.path(tag)
        tree = jax.device_get(tree)
        self._ckptr.save(p, tree, force=True)
        return p

    def restore(self, tag, template: Any = None) -> Any:
        p = self.path(tag)
        if template is not None:
            try:
                return self._ckptr.restore(p, item=template)
            except ValueError:
                # template is a subtree of the saved tree (e.g. params-only
                # eval loads): restore just the requested leaves
                return self._ckptr.restore(
                    p, args=ocp.args.PyTreeRestore(
                        item=template, partial_restore=True))
        return self._ckptr.restore(p)

    def tags(self):
        if not os.path.isdir(self.run_dir):
            return []
        out = []
        for name in os.listdir(self.run_dir):
            if os.path.isdir(os.path.join(self.run_dir, name)):
                try:
                    out.append(int(name))
                except ValueError:
                    continue
        return sorted(out)

    def latest(self) -> Optional[int]:
        tags = self.tags()
        return tags[-1] if tags else None


_EMPTY = object()


def _prune_empty(tree):
    """Drop empty subtrees (None / {} / empty optax states) that orbax cannot
    store; returns _EMPTY for a fully-empty tree."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            pv = _prune_empty(v)
            if pv is not _EMPTY:
                out[k] = pv
        return out if out else _EMPTY
    if tree is None:
        return _EMPTY
    return tree


def _merge_restored(template, restored):
    """Graft restored values back onto the full (unpruned) template dict."""
    if isinstance(template, dict):
        return {
            k: (_merge_restored(v, restored[k]) if isinstance(restored, dict)
                and k in restored else v)
            for k, v in template.items()
        }
    return template if restored is None else restored


def save_state(ckpt: Checkpointer, tag, state) -> str:
    """Save ANY train-state pytree — TrainState or a multi-net state
    (GanState/FontState/StyleGanState) — as a plain nested dict that always
    carries params, batch_stats, constants, optimizer state, and step.  This
    is the uniform checkpoint surface all eight trainers use (the reference
    only ever torch.saves modules and forgets optimizers, train_BE.py:136-143;
    resume is a first-class capability here, SURVEY.md §5)."""
    sd = serialization.to_state_dict(jax.device_get(state))
    pruned = _prune_empty(sd)
    assert pruned is not _EMPTY, "refusing to checkpoint an empty state"
    return ckpt.save(tag, pruned)


def _missing_paths(template, tree, prefix=""):
    """Paths present in `template` (a pruned state dict) but absent from the
    restored `tree` — nonempty means the checkpoint layout does not match."""
    if not isinstance(template, dict):
        return []
    if not isinstance(tree, dict):
        return [prefix or "/"]
    out = []
    for k, v in template.items():
        p = f"{prefix}/{k}"
        if k not in tree:
            out.append(p)
        else:
            out.extend(_missing_paths(v, tree[k], p))
    return out


def _dual_encoder_blocks(d) -> int:
    """Return the block count if `d` is a dual-tower BCP ContentEndoer subtree
    (a{i}/b{i} TMPBlocks, the pre-round-3 checkpoint layout), else 0."""
    if not isinstance(d, dict) or "a0" not in d or "b0" not in d:
        return 0
    blocks = 0
    while f"a{blocks}" in d and f"b{blocks}" in d:
        blocks += 1
    if set(d) != {f"{t}{i}" for t in "ab" for i in range(blocks)}:
        return 0
    a0 = d["a0"]
    if not (isinstance(a0, dict)
            and all(c in a0 and isinstance(a0[c], dict) and "conv" in a0[c]
                    for c in ("c0", "c1", "c2"))):
        return 0
    return blocks


def _merge_dual_encoder(d: Dict, blocks: int) -> Dict:
    """Repack a dual-tower subtree into the MergedTMPBlock (m{i}) layout.
    Mirrors models/bcp.merge_encoder_params but works on plain state dicts so
    it also applies to optimizer-moment trees (Adam mu/nu mirror the params
    layout leaf-for-leaf)."""
    out = {}
    for i in range(blocks):
        m = {}
        for c, bias_b in (("c0", False), ("c1", True), ("c2", False)):
            a, b = d[f"a{i}"][c]["conv"], d[f"b{i}"][c]["conv"]
            m[f"{c}_kernel_a"] = a["kernel"]
            m[f"{c}_kernel_b"] = b["kernel"]
            m[f"{c}_bias_a"] = a["bias"]
            if bias_b:
                m[f"{c}_bias_b"] = b["bias"]
        out[f"m{i}"] = m
    return out


def migrate_dual_encoder_layout(tree):
    """Walk a restored state dict and convert every dual-tower ContentEndoer
    subtree (pre-round-3 BCP checkpoints) to the merged m{i} layout.
    Returns (tree, number_of_subtrees_converted)."""
    count = 0

    def walk(node):
        nonlocal count
        if not isinstance(node, dict):
            return node
        blocks = _dual_encoder_blocks(node)
        if blocks:
            count += 1
            return _merge_dual_encoder(node, blocks)
        return {k: walk(v) for k, v in node.items()}

    return walk(tree), count


def restore_state(run_dir: str, state, tag=None) -> Tuple[Any, int]:
    """Restore a checkpoint saved by `save_state` into a freshly-built state
    of the same structure (the template supplies tx/apply_fn statics).
    Returns (state, tag); tag defaults to the latest in run_dir.

    Checkpoints written before the BCP merged-encoder change (dual a{i}/b{i}
    TMPBlock towers instead of m{i} MergedTMPBlocks) are migrated in place —
    params and optimizer moments — via `migrate_dual_encoder_layout`."""
    ckpt = Checkpointer(run_dir)
    if tag is None:
        tag = ckpt.latest()
    if tag is None:
        raise FileNotFoundError(f"no checkpoints found under {run_dir}")
    template = serialization.to_state_dict(jax.device_get(state))
    pruned = _prune_empty(template)
    tree = ckpt.restore(tag)
    # Structure check BEFORE merging: orbax partial restores silently return
    # the template's own (fresh-init) values for keys missing from the saved
    # tree, which would turn a layout mismatch into a silent non-restore.
    missing = _missing_paths(pruned, tree)
    if missing:
        migrated, n = migrate_dual_encoder_layout(tree)
        if n == 0 or _missing_paths(pruned, migrated):
            raise ValueError(
                f"checkpoint {run_dir}/{tag} does not match the current state "
                f"layout (missing: {missing[:5]}{'...' if len(missing) > 5 else ''}) "
                "and no known migration applies (pre-round-3 dual-tower BCP "
                "checkpoints are converted by "
                "train/checkpoint.migrate_dual_encoder_layout)")
        tree = migrated
    merged = _merge_restored(template, tree)
    return serialization.from_state_dict(state, merged), tag

"""Checkpointing — orbax pytree checkpoints with the reference's run layout.

The reference torch.saves whole pickled nn.Modules per epoch into
logs/<FAMILY>/<YYYYmmdd-HHMMSS>/<epoch>.ckpt with no resume path
(train_BE.py:100-105,136-143).  Here checkpoints are pytrees of
{params, batch_stats, opt_state, step, epoch} with full save+resume, kept in
the same run-dir layout so tooling that walks logs/<family>/<ts>/ still works.
"""

import datetime
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

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
            return self._ckptr.restore(p, item=template)
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

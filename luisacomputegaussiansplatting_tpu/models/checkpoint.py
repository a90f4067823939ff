"""Training checkpoint save/restore.

The reference has no checkpointing at all (its only persistence is PLY in
/ PNG out, SURVEY.md section 5); training needs real checkpoints. Orbax is
used when available, with a plain-numpy .npz fallback so checkpoints work
in minimal environments. The PLY exporter (io.ply.save_ply) remains the
interchange format with other 3DGS tooling.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save_npz(path: str, tree: Any) -> None:
    """Save any pytree of arrays as an .npz (leaf order = treedef order)."""
    leaves, _ = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load_npz(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_npz, using `like` for the structure."""
    leaves, treedef = _flatten_with_paths(like)
    with np.load(path) as data:
        new_leaves = [
            jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
        ]
    return jax.tree.unflatten(treedef, new_leaves)


class CheckpointManager:
    """Rolling training checkpoints under a directory.

    Uses orbax-checkpoint when importable (async, multi-host safe),
    otherwise .npz files. The stored tree is whatever pytree the trainer
    passes (typically (TrainState, DensifyState, python step int)).
    """

    def __init__(self, directory: str, max_to_keep: int = 3, use_orbax: Optional[bool] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        if use_orbax is None:
            try:
                import orbax.checkpoint  # noqa: F401

                use_orbax = True
            except ImportError:
                use_orbax = False
        self.use_orbax = use_orbax
        self._mgr = None
        if self.use_orbax:
            import orbax.checkpoint as ocp

            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            )

    # -- orbax-independent API ------------------------------------------
    _CKPT_RE = re.compile(r"ckpt_(\d{8})\.npz")

    def _kept_steps(self):
        """Complete checkpoint files only (a crash between np.savez and
        os.replace can leave ckpt_*.npz.tmp.npz behind — never match it)."""
        steps = []
        for name in os.listdir(self.directory):
            m = self._CKPT_RE.fullmatch(name)
            if m:
                steps.append(int(m.group(1)))
            elif name.startswith("ckpt_") and name.endswith(".tmp.npz"):
                try:  # stale partial write: clean it up
                    os.remove(os.path.join(self.directory, name))
                except OSError:
                    pass
        return sorted(steps)

    def save(self, step: int, tree: Any) -> None:
        if self._mgr is not None:
            import orbax.checkpoint as ocp

            self._mgr.save(step, args=ocp.args.StandardSave(tree))
            self._mgr.wait_until_finished()
            return
        path = os.path.join(self.directory, f"ckpt_{step:08d}.npz")
        save_npz(path, tree)
        for stale in self._kept_steps()[: -self.max_to_keep]:
            os.remove(os.path.join(self.directory, f"ckpt_{stale:08d}.npz"))

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        kept = self._kept_steps()
        return kept[-1] if kept else None

    def restore(self, step: int, like: Any) -> Any:
        if self._mgr is not None:
            import orbax.checkpoint as ocp

            return self._mgr.restore(step, args=ocp.args.StandardRestore(like))
        path = os.path.join(self.directory, f"ckpt_{step:08d}.npz")
        return load_npz(path, like)

    def restore_latest(self, like: Any) -> Tuple[Optional[int], Any]:
        step = self.latest_step()
        if step is None:
            return None, like
        return step, self.restore(step, like)

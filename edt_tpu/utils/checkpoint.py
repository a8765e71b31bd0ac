"""Checkpoint/resume for training state (params, optimizer state, step).

The reference is a synchronous library with no training loop and no
checkpointing (SURVEY.md §5); this framework trains models
(DistanceFieldNet), so it ships the TPU-native equivalent: Orbax-backed
save/restore of arbitrary pytrees, safe under multi-host (every process
calls save/restore; Orbax coordinates the write from process 0 and
broadcasts structure).

Usage:
    from edt_tpu.utils import checkpoint as ckpt
    mgr = ckpt.Manager("/tmp/run1", max_to_keep=3)
    mgr.save(step, {"params": params, "opt_state": opt_state})
    state = mgr.restore({"params": params0, "opt_state": opt_state0})
    step = mgr.latest_step()
"""

from __future__ import annotations

import os


class Manager:
    """Thin wrapper over orbax.checkpoint.CheckpointManager.

    Falls back to a plain-pickle backend when orbax is unavailable (the
    fallback is single-process only and keeps the same API).
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = None
        try:
            import orbax.checkpoint as ocp

            self._ocp = ocp
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            )
        except Exception:  # pragma: no cover - env without orbax
            self._ocp = None
            self._max_to_keep = max_to_keep

    # ---- orbax-free fallback helpers ----

    def _pkl_path(self, step):
        return os.path.join(self.directory, f"ckpt_{step:012d}.pkl")

    def _pkl_steps(self):
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("ckpt_") and name.endswith(".pkl"):
                out.append(int(name[5:-4]))
        return sorted(out)

    # ---- API ----

    def save(self, step: int, state) -> None:
        if self._mgr is not None:
            self._mgr.save(step, args=self._ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
            return
        import pickle

        import jax

        host_state = jax.tree.map(
            lambda x: __import__("numpy").asarray(x), state
        )
        with open(self._pkl_path(step), "wb") as f:
            pickle.dump(host_state, f)
        steps = self._pkl_steps()
        for old in steps[: -self._max_to_keep]:
            os.remove(self._pkl_path(old))

    def latest_step(self):
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = self._pkl_steps()
        return steps[-1] if steps else None

    def restore(self, template, step: int | None = None):
        """Restore into the structure (and shardings) of ``template``."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if self._mgr is not None:
            return self._mgr.restore(
                step, args=self._ocp.args.StandardRestore(template)
            )
        import pickle

        with open(self._pkl_path(step), "rb") as f:
            return pickle.load(f)

"""Checkpoint save/restore via orbax.

Replaces Lightning's `ModelCheckpoint` + wandb artifact resolution
(`src/main.py:86-99`, `src/misc/wandb_tools.py:42`): the training state
(trainable params + optimizer state + step) is checkpointed every
`every_n_steps` with retention of the latest k; the frozen backbone params
are stored once at step 0 (`frozen/`) since they never change
(reference freezes them at `model_wrapper.py:131-136`).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from .train import TrainState


@dataclasses.dataclass(frozen=True)
class CheckpointCfg:
    directory: Path = Path("checkpoints")
    every_n_steps: int = 10_000
    keep: int = 5
    # Warm-start: another run's checkpoint directory to restore from when
    # this run has no state of its own (reference `checkpointing.load`,
    # `config/main.yaml`). Training continues from the loaded step into
    # this run's directory.
    load: Optional[Path] = None


class CheckpointManager:
    def __init__(self, cfg: CheckpointCfg):
        self.cfg = cfg
        path = Path(cfg.directory).absolute()
        path.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            path / "state",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=cfg.keep,
                save_interval_steps=cfg.every_n_steps,
            ),
        )
        self._frozen_dir = path / "frozen"

    def has_frozen(self) -> bool:
        return self._frozen_dir.exists()

    def save_frozen(self, frozen_params: Any) -> None:
        if not self._frozen_dir.exists():
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(self._frozen_dir, frozen_params)
            # StandardCheckpointer saves asynchronously; block so has_frozen()
            # (and an early crash) can't observe a half-written directory.
            ckptr.wait_until_finished()

    def restore_frozen(self, template: Any) -> Any:
        return ocp.StandardCheckpointer().restore(
            self._frozen_dir, target=template
        )

    def maybe_save(self, state: TrainState, force: bool = False) -> bool:
        """Save if the step is on the interval; `force=True` saves regardless
        (orbax's interval policy silently skips off-interval steps — the
        final step of a run must be forced)."""
        step = int(state.step)
        return self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def restore_latest(self, template: TrainState) -> Optional[TrainState]:
        """Latest state of this run; falls back to `cfg.load` (warm start)."""
        step = self._mgr.latest_step()
        if step is None:
            if self.cfg.load is not None:
                other = CheckpointManager(
                    dataclasses.replace(self.cfg, load=None,
                                        directory=Path(self.cfg.load))
                )
                state = other.restore_latest(template)
                if state is None:
                    raise FileNotFoundError(
                        f"checkpointing.load={self.cfg.load} has no state"
                    )
                if other.has_frozen() and not self.has_frozen():
                    # carry the source run's frozen perception weights too
                    ckptr = ocp.StandardCheckpointer()
                    ckptr.save(
                        self._frozen_dir, ckptr.restore(other._frozen_dir)
                    )
                    ckptr.wait_until_finished()
                return state
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

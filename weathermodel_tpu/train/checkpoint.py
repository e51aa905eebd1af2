"""Orbax checkpointing with the reference's logical split (SURVEY.md §5.4):

* **resume** — full training state (params + optimizer + epoch + best val +
  output_json), reference base_trainer.py:121-170;
* **pretrained-init / transfer** — params-only tree consumed by
  `models/transfer.py` (reference `load_pretrained` polymorphism).

Layout: {workdir}/checkpoints/{epoch}/ managed by CheckpointManager
(keeps recent + best), plus {workdir}/best/ params-only.
"""

import json
import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp

from weathermodel_tpu.train.state import TrainState


class Checkpointer:
    def __init__(self, workdir: str, max_to_keep: int = 3):
        self.workdir = os.path.abspath(workdir)
        os.makedirs(self.workdir, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            os.path.join(self.workdir, "checkpoints"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best_ckptr = ocp.StandardCheckpointer()

    def save(self, epoch: int, state: TrainState, best_val_loss: float,
             output_json: dict, mid_epoch: Optional[dict] = None,
             wait: bool = True) -> None:
        """Save full training state at `epoch`.

        `mid_epoch` marks a PREEMPTION checkpoint taken inside epoch
        `epoch` (SIGTERM-graceful stop, trainer._run_epoch): it records
        {"batch_idx": completed steps, "sums": running loss sums} so resume
        can fast-forward the deterministic loader/key chain and continue
        the epoch exactly where it stopped.

        `wait=False` returns once the state is snapshotted to host memory
        and lets orbax write the files in the background — the next
        epoch's compute overlaps the disk write (the device buffers may be
        donated/mutated immediately; orbax copies before save() returns).
        Preemption saves must keep wait=True: the process exits next."""
        # settle any in-flight async save before delete/save below
        self.manager.wait_until_finished()
        meta = {"epoch": epoch, "best_val_loss": float(best_val_loss)}
        if mid_epoch is not None:
            meta["mid_epoch"] = mid_epoch
        # the step may already exist: a preemption inside epoch N followed
        # by N's boundary save (or a second preemption) reuses step N —
        # the newer state always wins
        if epoch in self.manager.all_steps():
            self.manager.delete(epoch)
        self.manager.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
                output_json=ocp.args.JsonSave(output_json),
            ),
        )
        if wait:
            self.manager.wait_until_finished()

    def wait_until_finished(self) -> None:
        """Block until every async save (full-state and best-params) has
        committed to disk. Call before process exit / reading the files."""
        self.manager.wait_until_finished()
        self._best_ckptr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        self.manager.wait_until_finished()
        return self.manager.latest_step()

    def restore(self, state_template: TrainState,
                epoch: Optional[int] = None
                ) -> Tuple[TrainState, int, float, dict, Optional[dict]]:
        self.manager.wait_until_finished()
        epoch = epoch if epoch is not None else self.manager.latest_step()
        restored = self.manager.restore(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                meta=ocp.args.JsonRestore(),
                output_json=ocp.args.JsonRestore(),
            ),
        )
        meta = restored["meta"]
        return (restored["state"], meta["epoch"], meta["best_val_loss"],
                restored["output_json"], meta.get("mid_epoch"))

    def save_best_params(self, params: Any, wait: bool = True) -> None:
        # settle any in-flight best save before rmtree'ing its target
        self._best_ckptr.wait_until_finished()
        path = os.path.join(self.workdir, "best")
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        self._best_ckptr.save(path, params)
        if wait:
            self._best_ckptr.wait_until_finished()

    def load_params(self, params_template: Any,
                    path: Optional[str] = None) -> Any:
        """Load a params-only tree (for pretrained-init transfer)."""
        self._best_ckptr.wait_until_finished()
        path = path or os.path.join(self.workdir, "best")
        return self._best_ckptr.restore(path, target=params_template)


def write_output_json(workdir: str, name: str, output_json: dict) -> str:
    """Per-epoch experiment record, the reference's comparison artifact
    (base_trainer.py:475-489: `{name}_output.json`)."""
    path = os.path.join(workdir, f"{name}_output.json")
    os.makedirs(workdir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(output_json, f, indent=2)
    return path

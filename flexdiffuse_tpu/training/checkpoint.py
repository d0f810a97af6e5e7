"""Training checkpoint/resume: orbax-backed save/restore of the full loop
state (trained tree, optimizer state, EMA, PRNG keys, loss history).

The reference has no training at all (SURVEY.md §5: "no training, so
none") — this is the production-framework counterpart the TPU build
needs: a fine-tune interrupted at step N resumes bit-exactly, because
every source of randomness in the loop is checkpointed or replayable:

* ``step_key`` / ``data_key`` are saved verbatim (restoring them makes
  resume independent of the ``key=`` argument passed to the resuming
  call);
* the shuffled batch stream is a pure function of ``data_key``
  (data.py ``batches``), so resume fast-forwards it with
  ``batches(..., skip=start)`` — a key-split replay, no sample compute.

Orbax notes: saves run **synchronously** (``enable_async_checkpointing=
False``) — the async commit path deadlocks in sandboxed/single-process
environments and a training step is long enough that background saves
buy nothing. Retention keeps the newest ``keep`` checkpoints.
"""
from __future__ import annotations

import logging
import os
from typing import Any, List, Optional, Tuple

log = logging.getLogger(__name__)


class TrainCheckpointer:
    """Checkpoint manager for the training loop (loop.py ``_run``).

    ``state`` is a flat dict of arrays/pytrees: ``tree`` (params or LoRA
    factors), ``opt_state``, ``data_key``, ``step_key``, plus ``ema``
    when EMA is enabled. ``meta`` carries ``next_step`` (the loop index
    to resume at) and the logged ``losses``.
    """

    def __init__(self, directory: str, every: int = 100, keep: int = 3):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.every = int(every)
        self.directory = os.path.abspath(directory)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, enable_async_checkpointing=False),
            item_names=('state', 'meta'))

    # -- save ---------------------------------------------------------
    def should_save(self, i: int, steps: int) -> bool:
        """Save every ``every`` optimizer steps and always at the end."""
        return self.every > 0 and ((i + 1) % self.every == 0
                                   or i == steps - 1)

    def save(self, next_step: int, state: dict,
             losses: List[float]) -> None:
        ocp = self._ocp
        self.mgr.save(next_step, args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            meta=ocp.args.JsonSave({'next_step': next_step,
                                    'losses': list(losses)})))
        log.info('checkpoint written: step %d -> %s', next_step,
                 self.directory)

    # -- restore ------------------------------------------------------
    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore_latest(
            self, template: dict) -> Optional[Tuple[dict, int, List[float]]]:
        """Restore the newest checkpoint into ``template``'s structure.

        Returns ``(state, next_step, losses)`` or ``None`` when the
        directory holds no checkpoint yet. A structure mismatch (e.g.
        resuming with a different ``ema_decay`` or optimizer config)
        raises with a pointed message rather than orbax's tree diff.
        """
        step = self.mgr.latest_step()
        if step is None:
            return None
        ocp = self._ocp
        try:
            r = self.mgr.restore(step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
                meta=ocp.args.JsonRestore()))
        except Exception as e:
            raise RuntimeError(
                f'checkpoint at {self.directory} step {step} does not match '
                f'the current training configuration (same model/rank/'
                f'optimizer/ema_decay required to resume): {e}') from e
        meta = dict(r.meta)
        log.info('resuming from checkpoint step %d (%s)', meta['next_step'],
                 self.directory)
        return dict(r.state), int(meta['next_step']), list(meta['losses'])

    def close(self) -> None:
        self.mgr.close()

    def __enter__(self) -> 'TrainCheckpointer':
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()

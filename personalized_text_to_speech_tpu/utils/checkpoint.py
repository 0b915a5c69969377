"""Orbax checkpointing with full train state + rolling retention.

Improves on the reference persistence (reference ``utils.py:183-193`` +
``finetune_speaker_v2.py:264-303``): the reference saves weights only — its
optimizer state is never saved (``save_checkpoint(net_g, None, …)``) so
resume loses Adam moments; here the complete (params, opt_state, step) for
both networks round-trips.  Retention keeps the latest N numbered steps
plus a ``latest`` alias, like the reference's ``G_latest`` + 4 rolling
checkpoints.  Reference ``.pth`` import/export lives in
:mod:`.torch_compat`.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory: str, preserved: int = 4) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=preserved, create=True, enable_async_checkpointing=False
    )
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_train_state(
    directory: str,
    step: int,
    g_state: Any,
    d_state: Any,
    preserved: int = 4,
) -> None:
    mgr = _manager(directory, preserved)
    payload = {
        "g_params": g_state.params,
        "g_opt_state": g_state.opt_state,
        "d_params": d_state.params,
        "d_opt_state": d_state.opt_state,
    }
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_train_state(
    directory: str,
    g_state: Any,
    d_state: Any,
    step: Optional[int] = None,
):
    """Restore into existing state templates; returns (g_state, d_state, step)."""
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        return g_state, d_state, 0
    template = {
        "g_params": g_state.params,
        "g_opt_state": g_state.opt_state,
        "d_params": d_state.params,
        "d_opt_state": d_state.opt_state,
    }
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    g_state = g_state.replace(
        step=step, params=restored["g_params"], opt_state=restored["g_opt_state"]
    )
    d_state = d_state.replace(
        step=step, params=restored["d_params"], opt_state=restored["d_opt_state"]
    )
    return g_state, d_state, step


def save_params(directory: str, params: Any, step: int = 0) -> None:
    """Inference-only params checkpoint."""
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(directory), f"params_{step}")
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def restore_params(path: str, template: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)

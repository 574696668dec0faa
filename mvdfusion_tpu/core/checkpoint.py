"""Checkpoint save/resume via Orbax.

Counterpart of the reference's torch.save/load protocol (train.py:166-181,
145-153; demo.py:161-169): a step-indexed directory of
{params, opt_state, global_step, epoch, local_step} pytrees plus a `latest`
pointer. Orbax handles atomic writes and async I/O; on TPU pods it writes
per-host shards of sharded arrays.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, payload: dict) -> None:
    """Save a pytree payload at `ckpt_dir/step_{step}` and update `latest`."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(ckpt_dir, "latest"), "w") as fp:
        fp.write(f"step_{step:08d}")


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    marker = os.path.join(ckpt_dir, "latest")
    if not os.path.exists(marker):
        return None
    with open(marker) as fp:
        name = fp.read().strip()
    path = os.path.join(ckpt_dir, name)
    return path if os.path.exists(path) else None


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a payload matching `template`'s pytree structure/shapes."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=template)

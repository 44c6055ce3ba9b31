"""Checkpoint save/restore with auto-resume from the latest step.

Parity: reference checkpoints are torch.save dicts of
{iter, model, model_config, optimizer[, scheduler]} written every
``save_model_every`` on the main process (train_rqvae.py:209-221,
train_decoder.py:247-259), and resumed manually by path. Here:

  * Orbax writes {params, opt_state} pytrees plus a JSON sidecar with
    {step, config}; directory layout <root>/step_<N>/.
  * ``latest_step`` enables automatic resume (the reference required a
    hand-edited ``pretrained_*_path``; we keep the explicit-path API too).
  * the RQ-VAE -> decoder handoff contract is the same: the decoder config
    points at an RQ-VAE checkpoint directory and loads params only.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # orbax is the primary backend; fall back to npz if unavailable
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

_STEP_RE = re.compile(r"^step_(\d+)$")


def _step_dir(root: str, step: int) -> str:
    # orbax rejects relative paths; anchor to cwd so "out/rqvae/" configs work
    return os.path.abspath(os.path.join(root, f"step_{step}"))


def latest_step(root: str) -> Optional[int]:
    if not os.path.isdir(root):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(root)
        if (m := _STEP_RE.match(name))
        and os.path.exists(os.path.join(root, name, "DONE"))
    ]
    return max(steps) if steps else None


def save(root: str, step: int, state: Any, meta: Optional[dict] = None) -> str:
    """state: any pytree (e.g. {'params': ..., 'opt_state': ...}).

    Multi-process: EVERY process must call this (orbax synchronizes all
    processes around the write — a process-0-only call deadlocks at its
    global barrier; caught by tests/test_multiprocess.py). Only process 0
    writes the meta/DONE sidecars and the npz fallback."""
    path = _step_dir(root, step)
    primary = jax.process_index() == 0
    if primary:
        os.makedirs(path, exist_ok=True)
    # multi-host-safe host fetch: plain device_get raises on arrays whose
    # shards span processes (tensor-parallel params / Adam moments)
    from rqvae_tpu.parallel.mesh import fetch_to_host

    state = fetch_to_host(state)
    if _HAS_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(path, "state"), state, force=True)
    elif primary:
        flat, treedef = jax.tree_util.tree_flatten(state)
        np.savez(os.path.join(path, "state.npz"), *flat)
    if primary:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"step": step, **(meta or {})}, f)
        with open(os.path.join(path, "DONE"), "w") as f:
            f.write("ok")
    return path


def restore(root: str, step: Optional[int] = None,
            target: Any = None, partial: bool = False) -> Tuple[Any, dict]:
    """Returns (state, meta). ``target`` provides the pytree structure/dtypes
    (pass an abstract or concrete example state). ``partial=True`` restores
    only the subtrees present in ``target`` (e.g. params without opt_state —
    the decoder's frozen-tokenizer load)."""
    if step is None:
        step = latest_step(root)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {root}")
    path = _step_dir(root, step)
    if _HAS_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        if target is not None:
            restore_args = jax.tree.map(
                lambda x: ocp.RestoreArgs(restore_type=np.ndarray), target
            )
            state = ckptr.restore(
                os.path.join(path, "state"),
                args=ocp.args.PyTreeRestore(
                    item=target, restore_args=restore_args,
                    partial_restore=partial,
                ),
            )
        else:
            state = ckptr.restore(os.path.join(path, "state"))
    else:
        z = np.load(os.path.join(path, "state.npz"), allow_pickle=False)
        # positional savez names are arr_<i>; z.files order is unspecified,
        # so index explicitly to preserve the flatten order
        flat = [z[f"arr_{i}"] for i in range(len(z.files))]
        _, treedef = jax.tree_util.tree_flatten(target)
        state = jax.tree_util.tree_unflatten(treedef, flat)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    # restored leaves are host numpy; hand back device arrays
    state = jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, state
    )
    return state, meta

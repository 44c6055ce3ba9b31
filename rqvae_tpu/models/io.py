"""Model-only save/load: share weights without optimizer state.

Parity: the reference's ``RqVae.load_pretrained`` (modules/rqvae.py:103-106)
and its HF-Hub ``PyTorchModelHubMixin`` publish path (modules/rqvae.py:13,37,
train_decoder.py:134-136). There is no hub in an airgapped TPU pod, so the
equivalent is a self-describing directory: params checkpoint + the model
config JSON — anything that can read the directory can rebuild the model
without the training config that produced it.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import jax

from rqvae_tpu.models import retrieval, rqvae
from rqvae_tpu.train import checkpoint as ckpt_lib
from rqvae_tpu.utils import config as config_lib

_KIND_TO_CFG = {
    "rqvae": rqvae.RqVaeConfig,
    "retrieval": retrieval.RetrievalConfig,
}


def save_pretrained(path: str, params, cfg) -> str:
    """Write {params, model config, kind} under ``path`` (step_0 layout)."""
    if isinstance(cfg, rqvae.RqVaeConfig):
        kind = "rqvae"
    elif isinstance(cfg, retrieval.RetrievalConfig):
        kind = "retrieval"
    else:
        raise TypeError(f"unsupported config type: {type(cfg)}")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model_config.json"), "w") as f:
        json.dump({"kind": kind, "config": config_lib.config_to_dict(cfg)}, f)
    ckpt_lib.save(path, 0, {"params": jax.device_get(params)})
    return path


def load_pretrained(path: str) -> Tuple[dict, object]:
    """Returns (params, model config) from a save_pretrained directory."""
    with open(os.path.join(path, "model_config.json")) as f:
        meta = json.load(f)
    cfg_cls = _KIND_TO_CFG[meta["kind"]]
    cfg = config_lib.from_dict(cfg_cls, meta["config"])
    init_fn = rqvae.init if meta["kind"] == "rqvae" else retrieval.init
    template = jax.eval_shape(lambda: init_fn(jax.random.PRNGKey(0), cfg))
    state, _ = ckpt_lib.restore(
        path, target={"params": jax.tree.map(
            lambda s: jax.numpy.zeros(s.shape, s.dtype), template
        )},
    )
    return state["params"], cfg


def _cfg_fields(cls):
    return {f.name for f in dataclasses.fields(cls)}


# ---------------------------------------------------------------------------
# Hub publish / load (parity: reference PyTorchModelHubMixin on RqVae,
# modules/rqvae.py:13,37, pushed from train_decoder.py:134-136). The airgapped
# default stays the local directory above; these wrappers add the hub leg when
# the environment has credentials + egress.
# ---------------------------------------------------------------------------


def push_to_hub(local_dir: str, repo_id: str, *, private: bool = True,
                token: str | None = None) -> str:
    """Upload a ``save_pretrained`` directory as a hub model repo.

    Returns the repo URL. Raises a RuntimeError with a clear message when the
    hub is unreachable (this build environment has zero egress — the local
    directory under ``local_dir`` is always the source of truth).
    """
    try:
        from huggingface_hub import HfApi
    except ImportError as e:  # pragma: no cover - baked into this image
        raise RuntimeError("huggingface_hub is not installed") from e
    api = HfApi(token=token)
    try:
        api.create_repo(repo_id, private=private, exist_ok=True)
        api.upload_folder(folder_path=local_dir, repo_id=repo_id)
    except Exception as e:
        raise RuntimeError(
            f"hub push of {local_dir!r} to {repo_id!r} failed (no egress from "
            f"an airgapped pod?): {e}"
        ) from e
    return f"https://huggingface.co/{repo_id}"


def load_pretrained_auto(path_or_repo: str, *, token: str | None = None,
                         revision: str | None = None):
    """``load_pretrained`` accepting a local directory OR a hub repo id
    (reference parity: ``RqVae.load_pretrained`` via PyTorchModelHubMixin
    resolves both). Hub repos are snapshot-downloaded then read locally."""
    if os.path.isdir(path_or_repo):
        return load_pretrained(path_or_repo)
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("huggingface_hub is not installed") from e
    try:
        local = snapshot_download(path_or_repo, token=token, revision=revision)
    except Exception as e:
        raise RuntimeError(
            f"{path_or_repo!r} is neither a local save_pretrained directory "
            f"nor a reachable hub repo: {e}"
        ) from e
    return load_pretrained(local)

"""HF checkpoint downloader (dormant in no-egress environments).

Behavioral parity with the reference downloader
(reference: hydrainfer/model/downloader.py:44-86): snapshot-download a
repo's config/tokenizer/weights, preferring safetensors and falling back to
pickle (.bin/.pth) files with an on-disk conversion to safetensors — the
only weight format the loader reads (models/weight_loader.py).

This build environment has zero egress, so every network call is guarded:
set HYDRAINFER_ALLOW_DOWNLOAD=1 (or pass allow_download=True) in a real
deployment. getModelFactory calls `ensure_local_model` on non-existent
model paths that look like repo ids, which makes `model.path=org/name`
work exactly like the reference's auto-download.
"""
import os
from typing import Optional

from ..utils.logger import getLogger

logger = getLogger(__name__)


def downloads_enabled(allow_download: Optional[bool] = None) -> bool:
    if allow_download is not None:
        return allow_download
    return os.environ.get("HYDRAINFER_ALLOW_DOWNLOAD", "0") == "1"


def convert_pickle_to_safetensors(path: str) -> None:
    """Convert every .bin/.pth pickle checkpoint under `path` into a
    sibling .safetensors file (skips already-converted and non-tensor
    pickles). Reference: downloader.py:5-39."""
    import torch
    from safetensors.torch import save_file

    for filename in os.listdir(path):
        if not (filename.endswith(".bin") or filename.endswith(".pth")):
            continue
        st_path = os.path.join(path, os.path.splitext(filename)[0]
                               + ".safetensors")
        if os.path.exists(st_path):
            continue
        # weights_only: never execute unpickled code from a downloaded repo
        # (legacy full-object pickles are skipped with a warning instead)
        try:
            obj = torch.load(os.path.join(path, filename),
                             map_location="cpu", weights_only=True)
        except Exception:
            logger.warning(f"{filename} is not a weights-only pickle; "
                           "skipping (convert it manually if trusted)")
            continue
        state_dict = obj.state_dict() if hasattr(obj, "state_dict") else obj
        if not isinstance(state_dict, dict) or not all(
                isinstance(v, torch.Tensor) for v in state_dict.values()):
            logger.info(f"ignoring non-tensor pickle file: {filename}")
            continue
        # clone to break shared-storage tensors (safetensors requirement)
        save_file({k: v.clone() for k, v in state_dict.items()}, st_path)
        logger.info(f"converted {filename} -> {os.path.basename(st_path)}")


def download_hf_model(repo_id: str, revision: Optional[str] = None,
                      allow_patterns: Optional[str] = None,
                      cache_dir: Optional[str] = None,
                      convert_to_safetensors: bool = True,
                      allow_download: Optional[bool] = None) -> str:
    """Snapshot-download `repo_id` and return the local path.

    allow_patterns: comma-separated filename globs; defaults to configs +
    tokenizer files + safetensors (or pickles when the repo has no
    safetensors, converted locally). Reference: downloader.py:44-86.
    """
    assert repo_id, "provide a repo_id"
    if not downloads_enabled(allow_download):
        raise RuntimeError(
            f"model download of {repo_id!r} requested but downloads are "
            "disabled in this environment; set HYDRAINFER_ALLOW_DOWNLOAD=1 "
            "or pre-stage the checkpoint and pass its local path")

    from huggingface_hub import HfApi, snapshot_download

    revision = revision or "main"
    files = HfApi().list_repo_files(repo_id=repo_id, revision=revision)
    has_safetensors = any(f.endswith(".safetensors") for f in files)
    if not allow_patterns:
        allow_patterns = "*.json,*.tiktoken,*.model,*.txt"
        allow_patterns += (",*.safetensors" if has_safetensors
                           else ",*.bin,*.pth")
    path = snapshot_download(repo_id, revision=revision, cache_dir=cache_dir,
                             allow_patterns=allow_patterns.split(","))
    if convert_to_safetensors and not has_safetensors:
        convert_pickle_to_safetensors(path)
    logger.info(f"downloaded {repo_id}@{revision} -> {path}")
    return path


def ensure_local_model(path: str,
                       allow_download: Optional[bool] = None) -> str:
    """Resolve a model path: local directories pass through; something that
    looks like a HF repo id ("org/name") is downloaded when downloads are
    enabled (reference auto-download: model_factory.py:121-129)."""
    if os.path.isdir(path):
        return path
    looks_like_repo = ("/" in path and not os.path.isabs(path)
                       and path.count("/") == 1)
    if looks_like_repo and downloads_enabled(allow_download):
        return download_hf_model(path, allow_download=allow_download)
    return path

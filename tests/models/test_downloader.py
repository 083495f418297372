"""HF downloader (dormant in no-egress environments): the guard logic and
pickle→safetensors conversion are testable offline; the snapshot download
itself only runs with HYDRAINFER_ALLOW_DOWNLOAD=1
(reference: hydrainfer/model/downloader.py:44-86)."""
import os

import pytest

from hydrainfer_tpu.models.downloader import (convert_pickle_to_safetensors,
                                              download_hf_model,
                                              downloads_enabled,
                                              ensure_local_model)


def test_downloads_disabled_by_default(monkeypatch):
    monkeypatch.delenv("HYDRAINFER_ALLOW_DOWNLOAD", raising=False)
    assert not downloads_enabled()
    with pytest.raises(RuntimeError, match="downloads are disabled"):
        download_hf_model("org/some-model")


def test_ensure_local_model_passthrough(tmp_path, monkeypatch):
    monkeypatch.delenv("HYDRAINFER_ALLOW_DOWNLOAD", raising=False)
    # existing dirs pass through untouched
    assert ensure_local_model(str(tmp_path)) == str(tmp_path)
    # repo-id-shaped strings pass through unchanged when downloads are off
    assert ensure_local_model("org/name") == "org/name"
    # absolute non-existent paths are never treated as repo ids
    assert ensure_local_model("/no/such/dir") == "/no/such/dir"


def test_convert_pickle_to_safetensors(tmp_path):
    torch = pytest.importorskip("torch")
    from safetensors.torch import load_file

    sd = {"w": torch.arange(6, dtype=torch.float32).reshape(2, 3),
          "b": torch.ones(3)}
    torch.save(sd, tmp_path / "pytorch_model.bin")
    # a non-tensor pickle must be skipped, not crash
    torch.save({"cfg": {"a": 1}}, tmp_path / "junk.bin")
    convert_pickle_to_safetensors(str(tmp_path))
    out = load_file(tmp_path / "pytorch_model.safetensors")
    assert torch.equal(out["w"], sd["w"]) and torch.equal(out["b"], sd["b"])
    assert not os.path.exists(tmp_path / "junk.safetensors")
    # idempotent: second run is a no-op
    convert_pickle_to_safetensors(str(tmp_path))

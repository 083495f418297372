"""Streaming detokenizer safety: some tokenizers decode exotic ids to LONE
UTF-16 SURROGATES (qwen2's byte-level vocab does, ~1.2% of random ids).
A lone surrogate cannot be utf-8 encoded, so one leaked delta used to raise
UnicodeEncodeError inside the API server's SSE writer mid-stream — the
error middleware then answered on an already-started stream and the client
hung forever (this wedged 23/64 requests of the chip SLO sweep,
deterministically). Two independent guards, both tested here:
  1. IncrementalDecoder never emits unencodable text (holds back a trailing
     high surrogate, replaces anything else unencodable);
  2. the SSE writer encodes with errors="replace" and closes the response
     on ANY exit, so even a hostile delta cannot wedge a client.
"""
import asyncio
import json

import aiohttp

from hydrainfer_tpu.models.tokenizer import IncrementalDecoder


class SurrogateTokenizer:
    """decode_ids maps ids straight to characters, including surrogates."""

    TABLE = {0: "a", 1: "\udec5", 2: "b", 3: "\ud8a7", 4: "c", 5: "�"}

    def decode_ids(self, ids):
        return "".join(self.TABLE[i % len(self.TABLE)] for i in ids)


def test_decoder_never_emits_unencodable():
    dec = IncrementalDecoder(SurrogateTokenizer())
    out = []
    for tid in [0, 1, 2, 3, 4, 0, 1, 1, 2]:
        text = dec.push(tid)
        text.encode("utf-8")     # must never raise
        out.append(text)
    # the printable characters all came through
    joined = "".join(out)
    assert "a" in joined and "b" in joined and "c" in joined


def test_decoder_holds_back_trailing_high_surrogate():
    dec = IncrementalDecoder(SurrogateTokenizer())
    assert dec.push(0) == "a"
    assert dec.push(3) == ""          # trailing high surrogate: held back
    nxt = dec.push(2)                 # completed by later text; sanitized
    nxt.encode("utf-8")
    assert nxt.endswith("b")


def test_sse_stream_survives_hostile_deltas(monkeypatch):
    """Even if a raw surrogate reaches the SSE writer (decoder bypassed),
    the stream must still deliver every data chunk and [DONE]."""
    from hydrainfer_tpu.models import tokenizer as tok_mod
    monkeypatch.setattr(tok_mod.IncrementalDecoder, "push",
                        lambda self, tid: "\udec5")

    from tests.entrypoint.test_api_server import run_with_server

    async def body(session, base):
        payload = {"messages": [{"role": "user", "content": "hostile"}],
                   "max_tokens": 4, "stream": True, "ignore_eos": True}
        async with session.post(f"{base}/v1/chat/completions",
                                json=payload) as resp:
            assert resp.status == 200
            done, chunks = False, 0
            async for line in resp.content:
                line = line.decode("utf-8", errors="replace").strip()
                if not line.startswith("data: "):
                    continue
                if line[len("data: "):] == "[DONE]":
                    done = True
                    break
                json.loads(line[len("data: "):])
                chunks += 1
            assert done, "stream never terminated"
            assert chunks == 4 + 1    # 4 deltas + the finish_reason chunk

    asyncio.run(asyncio.wait_for(run_with_server(body), timeout=120))

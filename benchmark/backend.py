"""Backend proxies: fire one request at an OpenAI-compatible server and
record per-token timestamps (reference: benchmark/backend.py:13)."""
import json
import time
from typing import Optional

import aiohttp

from .metric import OnlineRequestOutput
from .synthetic_dataset import SyntheticDataEntry


async def openai_chat_stream(session: aiohttp.ClientSession, base_url: str,
                             entry: SyntheticDataEntry,
                             request_id: str = "",
                             ignore_eos: bool = True) -> OnlineRequestOutput:
    out = OnlineRequestOutput(request_id=request_id,
                              prompt_len=len(entry.prompt.split()))
    content = []
    text = entry.prompt
    if entry.image_base64 is not None:
        text = text.replace("<image>", "").strip()
        content.append({"type": "image_url", "image_url": {
            "url": f"data:image/png;base64,{entry.image_base64}"}})
    content.append({"type": "text", "text": text})
    payload = {
        "messages": [{"role": "user", "content": content}],
        "max_tokens": entry.max_tokens,
        "stream": True,
        "ignore_eos": ignore_eos,
    }
    out.start_time = time.perf_counter()
    try:
        async with session.post(f"{base_url}/v1/chat/completions",
                                json=payload) as resp:
            if resp.status != 200:
                out.error_msg = f"http {resp.status}: {await resp.text()}"
                return out
            async for line in resp.content:
                line = line.decode().strip()
                if not line.startswith("data: "):
                    continue
                data = line[len("data: "):]
                if data == "[DONE]":
                    break
                chunk = json.loads(data)
                delta = chunk["choices"][0]["delta"].get("content")
                if delta:
                    out.token_times.append(time.perf_counter())
                    out.output_text += delta
        out.success = True
    except Exception as e:  # noqa: BLE001 - record, don't crash the sweep
        out.error_msg = repr(e)
    return out

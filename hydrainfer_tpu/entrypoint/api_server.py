"""OpenAI-compatible HTTP API server on aiohttp.

Behavioral parity with the reference's FastAPI server
(reference: hydrainfer/entrypoint/api_server.py): /health,
/v1/chat/completions with base64-PNG `image_url` content parts folded into
an `<image>` token, observer pattern decoupling the server from the cluster,
per-request AsyncStream. Improvements over the reference: non-stream mode is
supported (the reference raises, api_server.py:152) and /v1/completions is
wired.

Token delivery: in the single-controller design the engine pushes tokens
straight into the request's AsyncStream via a callback processor — the ZMQ
hop only exists for multi-process deployments (zmq_pull_addr).
"""
import asyncio
import contextlib
import json
import time
import uuid
from dataclasses import dataclass, field
from typing import Dict, Optional

from aiohttp import web

from ..engine.output_token_processor import OutputTokenParams
from ..engine.request_processor import RequestProcessParameters
from ..request import Request, SamplingParameters
from ..utils.async_stream import AsyncStream
from ..utils.logger import getLogger
from .api_protocol import (ChatCompletionChunk, ChatCompletionChunkChoice,
                           ChatCompletionRequest, ChatCompletionResponse,
                           ChatCompletionChoice, ChatMessage,
                           CompletionRequest, DeltaMessage, UsageInfo)

logger = getLogger(__name__)


class RequestObserver:
    """Implemented by the cluster: receives parsed requests
    (reference: api_server.py:20-21)."""

    async def add_request(self, request: Request,
                          params: RequestProcessParameters) -> None:
        raise NotImplementedError


@dataclass
class APIServerConfig:
    host: str = "127.0.0.1"
    port: int = 8000
    model_name: str = "hydrainfer-tpu"
    zmq_pull_addr: Optional[str] = None   # multi-process token return path


@web.middleware
async def _error_middleware(request, handler):
    try:
        return await handler(request)
    except web.HTTPException:
        raise
    except (json.JSONDecodeError, ValueError, TypeError) as e:
        return web.json_response(
            {"error": {"message": str(e), "type": "invalid_request_error"}},
            status=400)
    except Exception as e:  # pragma: no cover - defensive
        logger.exception("request failed")
        return web.json_response(
            {"error": {"message": str(e), "type": "internal_error"}},
            status=500)


class APIServer:
    def __init__(self, config: APIServerConfig, tokenizer,
                 image_token: str = "<image>",
                 image_token_calculator=None):
        self.config = config
        self.tokenizer = tokenizer
        self.image_token = image_token
        # for usage accounting: expands the image token to its feature-token
        # count (None = count the raw templated prompt only)
        self.image_token_calculator = image_token_calculator
        self.observers = []
        self.streams: Dict[str, AsyncStream] = {}
        self.app = web.Application(middlewares=[_error_middleware])
        self.app.add_routes([
            web.get("/health", self.health),
            web.get("/metrics", self.metrics),
            web.post("/v1/chat/completions", self.create_chat_completion),
            web.post("/v1/completions", self.create_completion),
            web.get("/debug/streams", self.debug_streams),
            web.get("/debug/tasks", self.debug_tasks),
        ])
        self._zmq_task = None

    def register_observer(self, observer: RequestObserver) -> None:
        self.observers.append(observer)

    # ---------------- token return paths ----------------

    def make_stream(self, request_id: str) -> AsyncStream:
        stream = AsyncStream()
        self.streams[request_id] = stream
        return stream

    def token_callback(self, request_id: str, loop):
        """In-process delivery: engine thread → stream."""
        def cb(token_id: int, text: str, is_last: bool):
            stream = self.streams.get(request_id)
            if stream is None:
                return
            stream.pushed = getattr(stream, "pushed", 0) + 1
            stream.last_push = time.time()
            stream.saw_last = is_last
            stream.put_threadsafe(loop, text)
            if is_last:
                stream.put_threadsafe(loop, None)
        return cb

    async def debug_streams(self, _request) -> web.Response:
        """Stall forensics: every stream still open, with how many tokens the
        engine has pushed into it, whether its final token arrived, and the
        age of the last push — distinguishes 'engine never finished the
        request' from 'engine finished but the response writer never woke'."""
        now = time.time()
        rows = {
            rid: {"pushed": getattr(s, "pushed", 0),
                  "saw_last": getattr(s, "saw_last", False),
                  "since_last_push_s": (round(now - s.last_push, 1)
                                        if hasattr(s, "last_push") else None),
                  "queued": s._queue.qsize()}
            for rid, s in self.streams.items()}
        return web.json_response(rows)

    async def debug_tasks(self, _request) -> web.Response:
        """Stall forensics, part 2: where every asyncio task in this process
        is suspended (in-process clients included)."""
        rows = []
        for t in asyncio.all_tasks():
            frames = t.get_stack(limit=8)
            rows.append({
                "name": t.get_name(),
                "stack": [f"{fr.f_code.co_filename.rsplit('/', 1)[-1]}:"
                          f"{fr.f_lineno} {fr.f_code.co_name}"
                          for fr in frames]})
        return web.json_response(rows)

    async def _zmq_recv_loop(self) -> None:
        """Multi-process delivery: (request_id, text|None) tuples over ZMQ
        (reference: api_server.py:50-61)."""
        import zmq
        import zmq.asyncio
        ctx = zmq.asyncio.Context()
        sock = ctx.socket(zmq.PULL)
        sock.bind(self.config.zmq_pull_addr)
        while True:
            request_id, text = await sock.recv_pyobj()
            stream = self.streams.get(request_id)
            if stream is not None:
                stream.put(text)

    # ---------------- routes ----------------

    async def health(self, _request) -> web.Response:
        return web.Response(text="ok")

    async def metrics(self, _request) -> web.Response:
        """Per-node serving metrics (KV pool, queues, prefix-cache hit
        rate, speculative acceptance) from every observer that exposes a
        metrics() — the JSON analogue of a Prometheus scrape."""
        import inspect
        out = {}
        for obs in self.observers:
            m = (getattr(obs, "metrics", None)
                 or getattr(obs, "metrics_async", None))
            if callable(m):
                try:
                    r = m()
                    if inspect.isawaitable(r):
                        r = await r
                    out.update(r)
                except Exception:
                    logger.exception("metrics collection failed")
        return web.json_response(out)

    def _count_prompt_tokens(self, prompt: str, image_b64) -> int:
        """Engine-accurate prompt token count (runs off the event loop):
        the raw templated prompt, with each image token expanded to its
        feature-token count when a calculator is wired
        (engine/request_processor.py:_expand_image_tokens)."""
        n = len(self.tokenizer.encode(prompt))
        if image_b64 and self.image_token_calculator is not None:
            try:
                import base64 as b64mod
                import io
                from PIL import Image
                img = Image.open(io.BytesIO(b64mod.b64decode(image_b64)))
                n += self.image_token_calculator.get_num_image_tokens(
                    (img.height, img.width)) - 1
            except Exception:
                logger.exception("image token count failed")
        return n

    def _parse_chat_content(self, messages):
        """Flatten content parts; image parts become the <image> token and
        their base64 payloads are collected (reference: api_server.py:66-82)."""
        parsed = []
        image_b64 = None
        for m in messages:
            content = m.content
            if isinstance(content, str):
                parsed.append({"role": m.role, "content": content})
                continue
            parts = []
            for part in content:
                if part.get("type") == "text":
                    parts.append(part.get("text", ""))
                elif part.get("type") == "image_url":
                    url = part["image_url"]["url"]
                    if url.startswith("data:"):
                        image_b64 = url.split(",", 1)[1]
                    parts.append(self.image_token)
            parsed.append({"role": m.role, "content": " ".join(parts)})
        return parsed, image_b64

    async def _submit(self, request_id: str, prompt: str,
                      image_b64: Optional[str],
                      sampling: SamplingParameters) -> AsyncStream:
        stream = self.make_stream(request_id)
        loop = asyncio.get_running_loop()
        from ..engine.output_token_processor import CallbackOutputTokenProcessor
        proc = CallbackOutputTokenProcessor(
            lambda tid, text, last, _rid=request_id: self.token_callback(_rid, loop)(tid, text, last),
            self.tokenizer)
        req = Request(request_id=request_id, prompt=prompt,
                      image_base64=image_b64, sampling_params=sampling)
        params = RequestProcessParameters(
            output_token_processors=[proc],
            output_token_params=OutputTokenParams(stream_output=True))
        for obs in self.observers:
            await obs.add_request(req, params)
        return stream

    async def create_chat_completion(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        chat = ChatCompletionRequest(**body)
        messages, image_b64 = self._parse_chat_content(chat.messages)
        prompt = self.tokenizer.apply_chat_template(messages)
        request_id = f"chatcmpl-{uuid.uuid4().hex[:24]}"
        max_tokens = chat.max_completion_tokens or chat.max_tokens or 128
        sampling = SamplingParameters(
            max_tokens=max_tokens, ignore_eos=chat.ignore_eos,
            temperature=chat.temperature, top_k=chat.top_k, top_p=chat.top_p)
        stream = await self._submit(request_id, prompt, image_b64, sampling)

        if chat.stream:
            resp = web.StreamResponse(headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache"})
            await resp.prepare(request)
            # Once the stream has started, the error middleware CANNOT help:
            # a raised exception would make it return a fresh response on a
            # connection mid-SSE, leaving the client waiting forever (this
            # exact mode wedged the SLO sweep: lone-surrogate deltas raised
            # UnicodeEncodeError inside .encode()). Encode with
            # errors="replace" so no delta can raise, and guarantee the
            # stream entry is reaped and the response closed on ANY exit.
            try:
                first = True
                async for text in stream:
                    # defense in depth: the decoder sanitizes already, but a
                    # lone surrogate here would raise inside pydantic's JSON
                    # serializer before the encode below even runs
                    text = text.encode("utf-8", "replace").decode("utf-8")
                    delta = DeltaMessage(content=text)
                    if first:
                        delta.role = "assistant"
                        first = False
                    chunk = ChatCompletionChunk(
                        id=request_id, model=self.config.model_name,
                        choices=[ChatCompletionChunkChoice(delta=delta)])
                    await resp.write(
                        f"data: {chunk.model_dump_json()}\n\n"
                        .encode("utf-8", errors="replace"))
                final = ChatCompletionChunk(
                    id=request_id, model=self.config.model_name,
                    choices=[ChatCompletionChunkChoice(
                        delta=DeltaMessage(), finish_reason="stop")])
                await resp.write(f"data: {final.model_dump_json()}\n\n"
                                 .encode("utf-8", errors="replace"))
                await resp.write(b"data: [DONE]\n\n")
                await resp.write_eof()
            except ConnectionResetError:
                pass                      # client went away mid-stream
            except Exception:
                logger.exception(f"{request_id} stream aborted")
                with contextlib.suppress(Exception):
                    await resp.write_eof()    # close so the client unblocks
            finally:
                self.streams.pop(request_id, None)
            return resp

        parts = [text async for text in stream]
        self.streams.pop(request_id, None)
        n_prompt = await asyncio.get_event_loop().run_in_executor(
            None, self._count_prompt_tokens, prompt, image_b64)
        response = ChatCompletionResponse(
            id=request_id, model=self.config.model_name,
            choices=[ChatCompletionChoice(
                message=ChatMessage(role="assistant", content="".join(parts)))],
            usage=UsageInfo(prompt_tokens=n_prompt,
                            completion_tokens=len(parts),
                            total_tokens=n_prompt + len(parts)))
        return web.json_response(json.loads(response.model_dump_json()))

    async def create_completion(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        comp = CompletionRequest(**body)
        prompt = comp.prompt if isinstance(comp.prompt, str) else comp.prompt[0]
        request_id = f"cmpl-{uuid.uuid4().hex[:24]}"
        sampling = SamplingParameters(
            max_tokens=comp.max_tokens or 128, ignore_eos=comp.ignore_eos,
            temperature=comp.temperature, top_p=comp.top_p)
        stream = await self._submit(request_id, prompt, None, sampling)
        parts = [text async for text in stream]
        self.streams.pop(request_id, None)
        return web.json_response({
            "id": request_id, "object": "text_completion",
            "model": self.config.model_name,
            "choices": [{"index": 0, "text": "".join(parts),
                         "finish_reason": "stop"}]})

    # ---------------- lifecycle ----------------

    async def start(self) -> web.AppRunner:
        if self.config.zmq_pull_addr:
            self._zmq_task = asyncio.create_task(self._zmq_recv_loop())
        runner = web.AppRunner(self.app)
        await runner.setup()
        site = web.TCPSite(runner, self.config.host, self.config.port)
        await site.start()
        logger.info(f"API server on http://{self.config.host}:{self.config.port}")
        return runner

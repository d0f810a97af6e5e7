"""Production JSON serving API — batched text-to-image over HTTP.

A headless counterpart to the browser UI (interface/server.py): stdlib
``ThreadingHTTPServer`` accepting concurrent JSON requests, with the
micro-batcher (serving/batcher.py) fusing same-shape requests into one
compiled device program per dispatch.

Endpoints:

* ``POST /v1/generate`` — ``{"prompt": ..., "negative_prompt": "",
  "steps": 25, "width": 512, "height": 512, "guidance_scale": 8.0,
  "seed": null, "samples": 1}`` → ``{"images": [<base64 PNG>, ...],
  "latency_ms": ..., "batched_with": N}``. Requests with equal
  (steps, size, cfg-mode) batch together; ``guidance_scale`` rides as a
  per-row vector so mixed scales share one program.
* ``GET /v1/health`` — liveness + device info.
* ``GET /v1/stats`` — request/batch counters, mean rows per batch,
  latency percentiles.

Seeds: a request's ``seed`` keys its own latent rows (folded with the
row index), so a request's sampling trajectory is independent of what
it was batched with. Results are **bitwise** identical for identical
padded batch shapes; across different batch shapes they are numerically
equivalent but not bit-equal (TPU programs compiled at different batch
shapes order bf16 accumulations differently — measured ~3e-2 image
drift over a sampling loop). Launch with ``fixed_rows=True``
(CLI ``--deterministic``) to pin one batch shape and make results
bitwise reproducible always, at the cost of padded compute on partial
batches.
"""
from __future__ import annotations

import base64
import collections
import io
import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, List, Optional

import numpy as np

log = logging.getLogger(__name__)

MAX_STEPS = 150
MAX_SIDE = 1024


class GenerationService:
    """Bridges HTTP payloads to one batched FlexPipeline call."""

    def __init__(self, runner, max_batch_rows: int = 8,
                 max_wait_ms: float = 30.0, fixed_rows: bool = False):
        from flexdiffuse_tpu.serving.batcher import MicroBatcher
        self.runner = runner
        self.batcher = MicroBatcher(self._run_batch,
                                    max_batch_rows=max_batch_rows,
                                    max_wait_ms=max_wait_ms,
                                    fixed_rows=fixed_rows)
        self._latencies = collections.deque(maxlen=512)
        self._lock = threading.Lock()

    # -- request side ------------------------------------------------
    def generate(self, payload: dict) -> dict:
        t0 = time.monotonic()
        req = self._validate(payload)
        group = (req['steps'], req['width'], req['height'],
                 req['guidance_scale'] > 1.0)
        fut = self.batcher.submit(req, rows=req['samples'], group=group)
        images, batched_with = fut.result()
        out = {
            'images': [self._png_b64(im) for im in images],
            'latency_ms': round((time.monotonic() - t0) * 1e3, 1),
            'batched_with': batched_with,
        }
        with self._lock:
            self._latencies.append(out['latency_ms'])
        return out

    def stats(self) -> dict:
        s = self.batcher.stats()
        with self._lock:
            lat = sorted(self._latencies)
        if lat:
            s['latency_ms_p50'] = lat[len(lat) // 2]
            s['latency_ms_p95'] = lat[min(len(lat) - 1,
                                          int(len(lat) * 0.95))]
        return s

    @staticmethod
    def _validate(p: dict) -> dict:
        if not isinstance(p, dict):
            raise ValueError('payload must be a JSON object')
        prompt = p.get('prompt', '')
        if not isinstance(prompt, str) or not prompt.strip():
            raise ValueError('prompt is required')
        steps = int(p.get('steps', 25))
        width = int(p.get('width', 512))
        height = int(p.get('height', 512))
        samples = int(p.get('samples', 1))
        if not 1 <= steps <= MAX_STEPS:
            raise ValueError(f'steps must be in [1, {MAX_STEPS}]')
        if width % 64 or height % 64 or not (64 <= width <= MAX_SIDE) \
                or not (64 <= height <= MAX_SIDE):
            raise ValueError(
                f'width/height must be multiples of 64 in [64, {MAX_SIDE}]')
        if not 1 <= samples <= 8:
            raise ValueError('samples must be in [1, 8]')
        seed = p.get('seed')
        return {
            'prompt': prompt,
            'negative_prompt': str(p.get('negative_prompt', '') or ''),
            'steps': steps, 'width': width, 'height': height,
            'samples': samples,
            'guidance_scale': float(p.get('guidance_scale', 8.0)),
            'seed': None if seed is None else int(seed),
            # Emphasis weighting ((word:1.3) / [word]); batched rows share
            # one 77-token context, so weighted prompts use a single window
            # (longer ones truncate, like classic 77-token truncation).
            'weighted': bool(p.get('weighted', False)),
        }

    @staticmethod
    def _png_b64(arr: np.ndarray) -> str:
        from PIL import Image
        if arr.dtype != np.uint8:  # pipeline 'np' output is float [0, 1]
            arr = (np.clip(arr, 0.0, 1.0) * 255).round().astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format='PNG')
        return base64.b64encode(buf.getvalue()).decode('ascii')

    # -- device side (single dispatcher thread) -----------------------
    def _run_batch(self, reqs: List[dict], total_rows: int):
        import jax
        import jax.numpy as jnp

        from flexdiffuse_tpu.pipeline import SimpleGuidance
        enc = self.runner.encoder
        rows_emb, rows_unc, rows_scale, rows_key = [], [], [], []
        for i, r in enumerate(reqs):
            if r.get('weighted'):
                emb = enc.prompt_weighted(r['prompt'], max_chunks=1)
                unc = enc.prompt_weighted(r['negative_prompt'] or '',
                                          max_chunks=1)
            else:
                emb = enc.prompt(r['prompt'])
                unc = enc.prompt(r['negative_prompt'] or '')
            seed = r['seed'] if r['seed'] is not None else int(
                time.time_ns() % (2**31))
            for s in range(r['samples']):
                rows_emb.append(emb[0])
                rows_unc.append(unc[0])
                rows_scale.append(r['guidance_scale'])
                rows_key.append(jax.random.fold_in(
                    jax.random.PRNGKey(seed), s))
        # Pad to the quantized row count by replicating the last row
        # (padding outputs are dropped below).
        n_real = len(rows_emb)
        while len(rows_emb) < total_rows:
            rows_emb.append(rows_emb[-1])
            rows_unc.append(rows_unc[-1])
            rows_scale.append(rows_scale[-1])
            rows_key.append(rows_key[-1])
        guidance = SimpleGuidance(
            embeddings=jnp.stack(rows_emb),
            uncond=jnp.stack(rows_unc),
            guidance_scale=jnp.asarray(
                rows_scale, jnp.float32).reshape(-1, 1, 1, 1),
            cfg=reqs[0]['guidance_scale'] > 1.0)
        r0 = reqs[0]
        pipe = self.runner.pipe
        f = pipe.vae_scale
        # Per-row latent noise from each request's own seed → a request's
        # trajectory doesn't depend on batch composition (bitwise-equal
        # per padded batch shape; see module docstring / fixed_rows).
        shape = (r0['height'] // f, r0['width'] // f, pipe.latent_channels)
        noise = jax.vmap(
            lambda k: jax.random.normal(k, shape, jnp.float32))(
                jnp.stack(rows_key))
        out = pipe(
            guidance, steps=r0['steps'],
            init_size=(r0['height'], r0['width']),
            key=rows_key[0], noise=noise,
            output_type='np', return_dict=False)
        images = np.asarray(out[0])  # (images, nsfw_flag) tuple
        images = images[:n_real]
        results = []
        i = 0
        for r in reqs:
            results.append((list(images[i:i + r['samples']]),
                            len(reqs) - 1))
            i += r['samples']
        return results


# ---------------------------------------------------------------------------
# HTTP layer


class _Handler(BaseHTTPRequestHandler):
    service: 'GenerationService' = None  # set by launch()

    def log_message(self, fmt, *args):
        log.info('%s %s', self.address_string(), fmt % args)

    def _send(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header('Content-Type', 'application/json')
        self.send_header('Content-Length', str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == '/v1/health':
            import jax
            self._send(200, {'status': 'ok',
                             'devices': [str(d) for d in jax.devices()]})
        elif self.path == '/v1/stats':
            self._send(200, self.service.stats())
        else:
            self._send(404, {'error': 'not found'})

    def do_POST(self):
        if self.path != '/v1/generate':
            self._send(404, {'error': 'not found'})
            return
        try:
            n = int(self.headers.get('Content-Length', 0))
            payload = json.loads(self.rfile.read(n) or b'{}')
            self._send(200, self.service.generate(payload))
        except ValueError as e:
            self._send(400, {'error': str(e)})
        except Exception as e:  # JSON-500, never a stack dump to the client
            log.exception('generate failed')
            self._send(500, {'error': str(e)[:300]})


def launch(runner_factory: Callable, port: int = 8000, lan: bool = False,
           max_batch_rows: int = 8, max_wait_ms: float = 30.0,
           fixed_rows: bool = False) -> ThreadingHTTPServer:
    """Build the service (loading models via ``runner_factory``) and return
    a ready-to-serve ThreadingHTTPServer (call ``serve_forever()``)."""
    service = GenerationService(runner_factory(),
                                max_batch_rows=max_batch_rows,
                                max_wait_ms=max_wait_ms,
                                fixed_rows=fixed_rows)
    handler = type('Handler', (_Handler,), {'service': service})
    host = '0.0.0.0' if lan else '127.0.0.1'
    httpd = ThreadingHTTPServer((host, port), handler)
    log.info('serving API on http://%s:%d (batch rows ≤ %d, wait %.0f ms)',
             host, port, max_batch_rows, max_wait_ms)
    return httpd

"""Web UI server tests: serve the page, drive /api/generate over HTTP."""
import base64
import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from flexdiffuse_tpu.interface import server as ui_server


@pytest.fixture(scope='module')
def ui(tmp_path_factory):
    from flexdiffuse_tpu.models import (AutoencoderKL, CLIPTextModel,
                                        CLIPVisionModel, TINY_TEXT, TINY_UNET,
                                        TINY_VAE, TINY_VISION,
                                        UNet2DCondition)
    from flexdiffuse_tpu.runner import Runner
    from flexdiffuse_tpu.config import RunConfig
    from flexdiffuse_tpu.text.tokenizer import FakeTokenizer

    def factory():
        k = jax.random.PRNGKey(0)
        text = CLIPTextModel(TINY_TEXT)
        text_params = text.init(k, jnp.zeros((1, 77), jnp.int32))
        vision = CLIPVisionModel(TINY_VISION)
        vision_params = vision.init(k, jnp.zeros((1, 32, 32, 3)))
        unet = UNet2DCondition(TINY_UNET)
        unet_params = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                                jnp.zeros((1, 77, TINY_TEXT.hidden_size)))
        vae = AutoencoderKL(TINY_VAE)
        vae_params = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
        out = str(tmp_path_factory.mktemp('ui_outputs'))
        return Runner.from_models(text, text_params, vision, vision_params,
                                  unet, unet_params, vae, vae_params,
                                  FakeTokenizer(),
                                  config=RunConfig(output_dir=out))

    ui_server._runner = None
    httpd = ui_server.launch(factory, lan=False, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f'http://127.0.0.1:{port}'
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(url, json.dumps(payload).encode(),
                                 {'Content-Type': 'application/json'})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_index_and_health(ui):
    with urllib.request.urlopen(ui + '/') as r:
        page = r.read().decode()
    assert 'Sandbox' in page and 'Compose' in page
    assert 'Threshold mult' in page  # reference slider set present
    with urllib.request.urlopen(ui + '/api/health') as r:
        assert json.loads(r.read())['ok']


def test_generate_endpoint(ui):
    out = _post(ui + '/api/generate', {
        'prompt': 'a deer', 'steps': 2, 'samples': 1, 'height': 64,
        'width': 64, 'seed': 1
    })
    assert len(out['images']) == 1
    raw = base64.b64decode(out['images'][0].split(',')[-1])
    img = Image.open(io.BytesIO(raw))
    assert img.size == (64, 64)
    # The batch grid rides along (reference sandbox gallery shows it,
    # interface/sandbox.py:181-185).
    assert out['grid'] is not None
    graw = base64.b64decode(out['grid'].split(',')[-1])
    assert Image.open(io.BytesIO(graw)).size == (64, 64)  # 1 sample -> 1x1


def test_compose_endpoint(ui):
    out = _post(ui + '/api/compose', {
        'bg_prompt': 'forest', 'steps': 2, 'samples': 1, 'height': 64,
        'width': 64, 'seed': 2,
        'entities': [['a bear', 0, 0, 32, 32, 0.8]]
    })
    assert len(out['images']) == 1
    assert out['grid'] is not None


def test_debug_sample_clamp(ui):
    # debug with samples*steps > 100 must clamp (interface/sandbox.py:16-19).
    out = _post(ui + '/api/generate', {
        'prompt': 'x', 'steps': 60, 'samples': 4, 'height': 64, 'width': 64,
        'debug': True, 'seed': 3
    })
    # clamped to 1 sample of 60 steps → 61 debug frames (PLMS scan length).
    assert len(out['images']) == 61


def test_error_surfaced_as_json(ui):
    req = urllib.request.Request(ui + '/api/generate',
                                 json.dumps({'prompt': '', 'steps': 2}).encode(),
                                 {'Content-Type': 'application/json'})
    try:
        urllib.request.urlopen(req)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        body = json.loads(e.read())
        assert 'error' in body
    assert raised

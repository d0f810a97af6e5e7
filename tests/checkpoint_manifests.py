"""Real-checkpoint key-name + shape manifests, generated offline.

The converters in ``flexdiffuse_tpu/weights/convert.py`` are exercised in
tests against flax-initialized trees; this module pins the *other* side of
the contract — the exact key schemas of the public checkpoints the product
claims to load (the artifacts the reference pulls at
``/root/reference/utils.py:61-66`` and their SD2.x / SDXL / ControlNet /
IP-Adapter siblings). Key names and tensor shapes are public metadata; the
generators below reproduce the diffusers / transformers ``state_dict()``
naming schemes structurally (module-by-module, mirroring the torch model
definitions), so a converter bug that only a real checkpoint would reveal
(missing key, wrong rank, silently ignored tensor) fails here instead of at
first real-weight load.

Every generator returns ``dict[str, tuple[int, ...]]`` (key → shape).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

Shape = Tuple[int, ...]
Manifest = Dict[str, Shape]


# ---------------------------------------------------------------------------
# diffusers UNet2DConditionModel


def _resnet_keys(out: Manifest, p: str, cin: int, cout: int,
                 temb: int) -> None:
    out[f'{p}.norm1.weight'] = (cin,)
    out[f'{p}.norm1.bias'] = (cin,)
    out[f'{p}.conv1.weight'] = (cout, cin, 3, 3)
    out[f'{p}.conv1.bias'] = (cout,)
    if temb:
        out[f'{p}.time_emb_proj.weight'] = (cout, temb)
        out[f'{p}.time_emb_proj.bias'] = (cout,)
    out[f'{p}.norm2.weight'] = (cout,)
    out[f'{p}.norm2.bias'] = (cout,)
    out[f'{p}.conv2.weight'] = (cout, cout, 3, 3)
    out[f'{p}.conv2.bias'] = (cout,)
    if cin != cout:
        out[f'{p}.conv_shortcut.weight'] = (cout, cin, 1, 1)
        out[f'{p}.conv_shortcut.bias'] = (cout,)


def _transformer2d_keys(out: Manifest, p: str, c: int, depth: int,
                        context: int, linear_proj: bool) -> None:
    out[f'{p}.norm.weight'] = (c,)
    out[f'{p}.norm.bias'] = (c,)
    proj_shape = (c, c) if linear_proj else (c, c, 1, 1)
    out[f'{p}.proj_in.weight'] = proj_shape
    out[f'{p}.proj_in.bias'] = (c,)
    for b in range(depth):
        t = f'{p}.transformer_blocks.{b}'
        for n in ('norm1', 'norm2', 'norm3'):
            out[f'{t}.{n}.weight'] = (c,)
            out[f'{t}.{n}.bias'] = (c,)
        out[f'{t}.attn1.to_q.weight'] = (c, c)
        out[f'{t}.attn1.to_k.weight'] = (c, c)
        out[f'{t}.attn1.to_v.weight'] = (c, c)
        out[f'{t}.attn1.to_out.0.weight'] = (c, c)
        out[f'{t}.attn1.to_out.0.bias'] = (c,)
        out[f'{t}.attn2.to_q.weight'] = (c, c)
        out[f'{t}.attn2.to_k.weight'] = (c, context)
        out[f'{t}.attn2.to_v.weight'] = (c, context)
        out[f'{t}.attn2.to_out.0.weight'] = (c, c)
        out[f'{t}.attn2.to_out.0.bias'] = (c,)
        out[f'{t}.ff.net.0.proj.weight'] = (8 * c, c)
        out[f'{t}.ff.net.0.proj.bias'] = (8 * c,)
        out[f'{t}.ff.net.2.weight'] = (c, 4 * c)
        out[f'{t}.ff.net.2.bias'] = (c,)
    out[f'{p}.proj_out.weight'] = proj_shape
    out[f'{p}.proj_out.bias'] = (c,)


def _unet_down_mid_keys(out: Manifest, blocks: Tuple[int, ...], lpb: int,
                        attention: Tuple[bool, ...], depths: List[int],
                        context: int, linear_proj: bool,
                        temb: int, mid_depth: int = -1) -> List[int]:
    """down_blocks + mid_block keys; returns the skip-channel list."""
    n = len(blocks)
    h = blocks[0]
    skips = [h]
    for i, ch in enumerate(blocks):
        for j in range(lpb):
            _resnet_keys(out, f'down_blocks.{i}.resnets.{j}', h, ch, temb)
            h = ch
            if attention[i]:
                _transformer2d_keys(out, f'down_blocks.{i}.attentions.{j}',
                                    ch, depths[i], context, linear_proj)
            skips.append(ch)
        if i != n - 1:
            out[f'down_blocks.{i}.downsamplers.0.conv.weight'] = (ch, ch, 3,
                                                                  3)
            out[f'down_blocks.{i}.downsamplers.0.conv.bias'] = (ch,)
            skips.append(ch)
    mid = blocks[-1]
    _resnet_keys(out, 'mid_block.resnets.0', mid, mid, temb)
    _transformer2d_keys(out, 'mid_block.attentions.0', mid,
                        depths[n - 1] if mid_depth < 0 else mid_depth,
                        context, linear_proj)
    _resnet_keys(out, 'mid_block.resnets.1', mid, mid, temb)
    return skips


def unet_manifest(blocks: Tuple[int, ...] = (320, 640, 1280, 1280),
                  layers_per_block: int = 2,
                  attention: Tuple[bool, ...] = (True, True, True, False),
                  depths: Tuple[int, ...] | int = 1,
                  context: int = 768,
                  in_channels: int = 4,
                  out_channels: int = 4,
                  linear_proj: bool = False,
                  addition_embed: bool = False,
                  addition_pooled_dim: int = 1280,
                  addition_time_embed_dim: int = 256,
                  num_time_ids: int = 6,
                  mid_depth: int = -1) -> Manifest:
    """diffusers ``UNet2DConditionModel`` state-dict schema.

    Defaults are ``CompVis/stable-diffusion-v1-4``'s ``unet/``; SD2.1 and
    SDXL-base via the overrides in the functions below.
    """
    n = len(blocks)
    if isinstance(depths, int):
        depths = tuple([depths] * n)
    temb = blocks[0] * 4
    out: Manifest = {}
    out['conv_in.weight'] = (blocks[0], in_channels, 3, 3)
    out['conv_in.bias'] = (blocks[0],)
    out['time_embedding.linear_1.weight'] = (temb, blocks[0])
    out['time_embedding.linear_1.bias'] = (temb,)
    out['time_embedding.linear_2.weight'] = (temb, temb)
    out['time_embedding.linear_2.bias'] = (temb,)
    if addition_embed:
        add_in = addition_pooled_dim + num_time_ids * addition_time_embed_dim
        out['add_embedding.linear_1.weight'] = (temb, add_in)
        out['add_embedding.linear_1.bias'] = (temb,)
        out['add_embedding.linear_2.weight'] = (temb, temb)
        out['add_embedding.linear_2.bias'] = (temb,)
    skips = _unet_down_mid_keys(out, blocks, layers_per_block, attention,
                                list(depths), context, linear_proj, temb,
                                mid_depth)
    h = blocks[-1]
    for i, ch in enumerate(reversed(blocks)):
        level = n - 1 - i
        for j in range(layers_per_block + 1):
            skip = skips.pop()
            _resnet_keys(out, f'up_blocks.{i}.resnets.{j}', h + skip, ch,
                         temb)
            h = ch
            if attention[level]:
                _transformer2d_keys(out, f'up_blocks.{i}.attentions.{j}', ch,
                                    depths[level], context, linear_proj)
        if i != n - 1:
            out[f'up_blocks.{i}.upsamplers.0.conv.weight'] = (ch, ch, 3, 3)
            out[f'up_blocks.{i}.upsamplers.0.conv.bias'] = (ch,)
    out['conv_norm_out.weight'] = (blocks[0],)
    out['conv_norm_out.bias'] = (blocks[0],)
    out['conv_out.weight'] = (out_channels, blocks[0], 3, 3)
    out['conv_out.bias'] = (out_channels,)
    return out


def sd14_unet_manifest() -> Manifest:
    """``CompVis/stable-diffusion-v1-4`` ``unet/diffusion_pytorch_model.bin``
    (identical schema for SD-1.5). 859,520,964 params."""
    return unet_manifest()


def sd21_unet_manifest() -> Manifest:
    """``stabilityai/stable-diffusion-2-1`` unet: SD1.x layout,
    ``use_linear_projection`` (2-D proj_in/out), 1024-dim OpenCLIP-H
    cross-attention."""
    return unet_manifest(context=1024, linear_proj=True)


def sdxl_unet_manifest() -> Manifest:
    """``stabilityai/stable-diffusion-xl-base-1.0`` unet: 3 levels, depths
    (0, 2, 10), 2048-dim dual-encoder context, text_time addition embedding.
    2,567,463,684 params."""
    return unet_manifest(blocks=(320, 640, 1280),
                         attention=(False, True, True), depths=(0, 2, 10),
                         context=2048, linear_proj=True, addition_embed=True)


def sdxl_refiner_unet_manifest() -> Manifest:
    """``stabilityai/stable-diffusion-xl-refiner-1.0`` unet: 4 levels
    (384/768/1536/1536) with attention only at the middle two, depth-4
    transformers including the mid block, bigG-only 1280-dim context, and a
    5-entry time_ids micro-cond (aesthetic score replaces target size:
    projection_class_embeddings_input_dim 2560 = 1280 + 5*256)."""
    return unet_manifest(blocks=(384, 768, 1536, 1536),
                         attention=(False, True, True, False),
                         depths=(0, 4, 4, 0), mid_depth=4,
                         context=1280, linear_proj=True, addition_embed=True,
                         num_time_ids=5)


# ---------------------------------------------------------------------------
# diffusers AutoencoderKL


def vae_manifest(blocks: Tuple[int, ...] = (128, 256, 512, 512),
                 layers_per_block: int = 2,
                 in_channels: int = 3,
                 out_channels: int = 3,
                 latent_channels: int = 4,
                 modern_attn: bool = False) -> Manifest:
    """diffusers ``AutoencoderKL`` state-dict schema.

    ``modern_attn=False`` reproduces the original SD-1.x VAE uploads
    (diffusers ≤0.14 ``query/key/value/proj_attn`` mid-attention naming, the
    scheme the reference's diffusers-0.3.0 stack uses); ``True`` the
    ``to_q/to_k/to_v/to_out.0`` renames of current re-exports (e.g. the SDXL
    VAE)."""
    n = len(blocks)
    out: Manifest = {}

    def attn(p: str, c: int) -> None:
        out[f'{p}.group_norm.weight'] = (c,)
        out[f'{p}.group_norm.bias'] = (c,)
        names = (('to_q', 'to_k', 'to_v', 'to_out.0')
                 if modern_attn else ('query', 'key', 'value', 'proj_attn'))
        for name in names:
            out[f'{p}.{name}.weight'] = (c, c)
            out[f'{p}.{name}.bias'] = (c,)

    # encoder
    out['encoder.conv_in.weight'] = (blocks[0], in_channels, 3, 3)
    out['encoder.conv_in.bias'] = (blocks[0],)
    h = blocks[0]
    for i, ch in enumerate(blocks):
        for j in range(layers_per_block):
            _resnet_keys(out, f'encoder.down_blocks.{i}.resnets.{j}', h, ch,
                         temb=0)
            h = ch
        if i != n - 1:
            out[f'encoder.down_blocks.{i}.downsamplers.0.conv.weight'] = (
                ch, ch, 3, 3)
            out[f'encoder.down_blocks.{i}.downsamplers.0.conv.bias'] = (ch,)
    mid = blocks[-1]
    _resnet_keys(out, 'encoder.mid_block.resnets.0', mid, mid, temb=0)
    attn('encoder.mid_block.attentions.0', mid)
    _resnet_keys(out, 'encoder.mid_block.resnets.1', mid, mid, temb=0)
    out['encoder.conv_norm_out.weight'] = (mid,)
    out['encoder.conv_norm_out.bias'] = (mid,)
    out['encoder.conv_out.weight'] = (2 * latent_channels, mid, 3, 3)
    out['encoder.conv_out.bias'] = (2 * latent_channels,)
    out['quant_conv.weight'] = (2 * latent_channels, 2 * latent_channels, 1,
                                1)
    out['quant_conv.bias'] = (2 * latent_channels,)
    out['post_quant_conv.weight'] = (latent_channels, latent_channels, 1, 1)
    out['post_quant_conv.bias'] = (latent_channels,)

    # decoder
    out['decoder.conv_in.weight'] = (mid, latent_channels, 3, 3)
    out['decoder.conv_in.bias'] = (mid,)
    _resnet_keys(out, 'decoder.mid_block.resnets.0', mid, mid, temb=0)
    attn('decoder.mid_block.attentions.0', mid)
    _resnet_keys(out, 'decoder.mid_block.resnets.1', mid, mid, temb=0)
    h = mid
    rev = tuple(reversed(blocks))
    for i, ch in enumerate(rev):
        for j in range(layers_per_block + 1):
            _resnet_keys(out, f'decoder.up_blocks.{i}.resnets.{j}', h, ch,
                         temb=0)
            h = ch
        if i != n - 1:
            out[f'decoder.up_blocks.{i}.upsamplers.0.conv.weight'] = (ch, ch,
                                                                      3, 3)
            out[f'decoder.up_blocks.{i}.upsamplers.0.conv.bias'] = (ch,)
    out['decoder.conv_norm_out.weight'] = (blocks[0],)
    out['decoder.conv_norm_out.bias'] = (blocks[0],)
    out['decoder.conv_out.weight'] = (out_channels, blocks[0], 3, 3)
    out['decoder.conv_out.bias'] = (out_channels,)
    return out


def sd14_vae_manifest() -> Manifest:
    """``CompVis/stable-diffusion-v1-4`` ``vae/`` (83,653,863 params; same
    schema for SD-1.5/2.x; SDXL's VAE differs only in attention naming)."""
    return vae_manifest()


# ---------------------------------------------------------------------------
# transformers CLIPModel (openai/clip-vit-large-patch14)


def _clip_encoder_keys(out: Manifest, p: str, layers: int, hidden: int,
                       inter: int) -> None:
    for i in range(layers):
        q = f'{p}.layers.{i}'
        for proj in ('q_proj', 'k_proj', 'v_proj', 'out_proj'):
            out[f'{q}.self_attn.{proj}.weight'] = (hidden, hidden)
            out[f'{q}.self_attn.{proj}.bias'] = (hidden,)
        out[f'{q}.layer_norm1.weight'] = (hidden,)
        out[f'{q}.layer_norm1.bias'] = (hidden,)
        out[f'{q}.mlp.fc1.weight'] = (inter, hidden)
        out[f'{q}.mlp.fc1.bias'] = (inter,)
        out[f'{q}.mlp.fc2.weight'] = (hidden, inter)
        out[f'{q}.mlp.fc2.bias'] = (hidden,)
        out[f'{q}.layer_norm2.weight'] = (hidden,)
        out[f'{q}.layer_norm2.bias'] = (hidden,)


def clip_text_manifest(hidden: int = 768, layers: int = 12,
                       inter: int = 3072, vocab: int = 49408,
                       positions: int = 77,
                       projection_dim: int = 0,
                       position_ids: bool = True,
                       prefix: str = 'text_model.') -> Manifest:
    """``CLIPTextModel``-shaped keys (the ``text_encoder/pytorch_model.bin``
    of SD snapshots, and the text half of a full CLIPModel).

    ``position_ids``: the real 2021-era checkpoint files carry the
    non-parameter position-id buffers (transformers <4.31 registered them as
    persistent); converters must tolerate them."""
    out: Manifest = {}
    p = f'{prefix}embeddings'
    out[f'{p}.token_embedding.weight'] = (vocab, hidden)
    out[f'{p}.position_embedding.weight'] = (positions, hidden)
    if position_ids:
        out[f'{p}.position_ids'] = (1, positions)
    _clip_encoder_keys(out, f'{prefix}encoder', layers, hidden, inter)
    out[f'{prefix}final_layer_norm.weight'] = (hidden,)
    out[f'{prefix}final_layer_norm.bias'] = (hidden,)
    if projection_dim:
        out['text_projection.weight'] = (projection_dim, hidden)
    return out


def clip_vision_manifest(hidden: int = 1024, layers: int = 24,
                         inter: int = 4096, image: int = 224,
                         patch: int = 14, projection_dim: int = 768,
                         position_ids: bool = True,
                         prefix: str = 'vision_model.') -> Manifest:
    out: Manifest = {}
    p = f'{prefix}embeddings'
    positions = (image // patch)**2 + 1
    out[f'{p}.class_embedding'] = (hidden,)
    out[f'{p}.patch_embedding.weight'] = (hidden, 3, patch, patch)
    out[f'{p}.position_embedding.weight'] = (positions, hidden)
    if position_ids:
        out[f'{p}.position_ids'] = (1, positions)
    out[f'{prefix}pre_layrnorm.weight'] = (hidden,)  # HF's typo, verbatim
    out[f'{prefix}pre_layrnorm.bias'] = (hidden,)
    _clip_encoder_keys(out, f'{prefix}encoder', layers, hidden, inter)
    out[f'{prefix}post_layernorm.weight'] = (hidden,)
    out[f'{prefix}post_layernorm.bias'] = (hidden,)
    if projection_dim:
        out['visual_projection.weight'] = (projection_dim, hidden)
    return out


def clip_vit_l14_manifest() -> Manifest:
    """Full ``openai/clip-vit-large-patch14`` ``CLIPModel`` state dict — the
    exact artifact the reference loads (``/root/reference/utils.py:61-63``).
    427,616,513 params incl. logit_scale."""
    out: Manifest = {'logit_scale': ()}
    out.update(clip_text_manifest(projection_dim=768))
    out.update(clip_vision_manifest())
    return out


def sd21_text_encoder_manifest() -> Manifest:
    """SD-2.1 ``text_encoder/``: OpenCLIP ViT-H text tower re-exported as a
    23-layer ``CLIPTextModel`` (the checkpoint drops layer 24 — SD2
    conditions on the penultimate layer)."""
    return clip_text_manifest(hidden=1024, layers=23, inter=4096)


def sdxl_text_encoder_2_manifest() -> Manifest:
    """SDXL ``text_encoder_2/``: OpenCLIP ViT-bigG as
    ``CLIPTextModelWithProjection`` (32 layers, 1280 hidden, 1280-d
    projection)."""
    return clip_text_manifest(hidden=1280, layers=32, inter=5120,
                              projection_dim=1280)


# ---------------------------------------------------------------------------
# diffusers ControlNetModel (lllyasviel/control_v11*_sd15_*)


def controlnet_sd15_manifest() -> Manifest:
    """SD-1.5 ControlNet (e.g. ``lllyasviel/control_v11p_sd15_canny``):
    UNet down+mid schema + conditioning embedding + zero convs.
    361,279,120 params."""
    out: Manifest = {}
    blocks = (320, 640, 1280, 1280)
    temb = 1280
    out['conv_in.weight'] = (320, 4, 3, 3)
    out['conv_in.bias'] = (320,)
    out['time_embedding.linear_1.weight'] = (temb, 320)
    out['time_embedding.linear_1.bias'] = (temb,)
    out['time_embedding.linear_2.weight'] = (temb, temb)
    out['time_embedding.linear_2.bias'] = (temb,)
    skips = _unet_down_mid_keys(out, blocks, 2, (True, True, True, False),
                                [1, 1, 1, 1], 768, False, temb)
    # conditioning embedding: 3→16→16→32→32→96→96→256→320
    ce = 'controlnet_cond_embedding'
    chans = (16, 16, 32, 32, 96, 96, 256)
    out[f'{ce}.conv_in.weight'] = (16, 3, 3, 3)
    out[f'{ce}.conv_in.bias'] = (16,)
    for b in range(6):
        out[f'{ce}.blocks.{b}.weight'] = (chans[b + 1], chans[b], 3, 3)
        out[f'{ce}.blocks.{b}.bias'] = (chans[b + 1],)
    out[f'{ce}.conv_out.weight'] = (320, 256, 3, 3)
    out[f'{ce}.conv_out.bias'] = (320,)
    for k, ch in enumerate(skips):
        out[f'controlnet_down_blocks.{k}.weight'] = (ch, ch, 1, 1)
        out[f'controlnet_down_blocks.{k}.bias'] = (ch,)
    out['controlnet_mid_block.weight'] = (1280, 1280, 1, 1)
    out['controlnet_mid_block.bias'] = (1280,)
    return out


# ---------------------------------------------------------------------------
# IP-Adapter (h94/IP-Adapter ip-adapter_sd15.bin)


def ip_adapter_sd15_manifest() -> Manifest:
    """``ip-adapter_sd15.bin`` flattened the way
    ``weights.load.load_state_dict`` flattens its nested torch dict:
    ``image_proj.{proj,norm}.*`` + ``ip_adapter.{i}.to_{k,v}_ip.weight``.

    The integer indices follow ``unet.attn_processors`` enumeration order —
    diffusers module registration order (down_blocks, up_blocks, mid_block),
    attn1/attn2 interleaved, so the 16 cross-attention layers land on the
    odd indices 1..31. The image encoder is OpenCLIP ViT-H (1024-d global
    embed) projected to 4 tokens × 768."""
    out: Manifest = {
        'image_proj.proj.weight': (4 * 768, 1024),
        'image_proj.proj.bias': (4 * 768,),
        'image_proj.norm.weight': (768,),
        'image_proj.norm.bias': (768,),
    }
    down = [320, 320, 640, 640, 1280, 1280]
    # up_blocks.0 is UpBlock2D (no attention) → 9 up attn layers, not 12
    up = [1280, 1280, 1280, 640, 640, 640, 320, 320, 320]
    mid = [1280]
    for n, ch in enumerate(down + up + mid):
        idx = 2 * n + 1
        out[f'ip_adapter.{idx}.to_k_ip.weight'] = (ch, 768)
        out[f'ip_adapter.{idx}.to_v_ip.weight'] = (ch, 768)
    return out


# ---------------------------------------------------------------------------
# Param-count ground truth (public model-card / HF metadata numbers) used to
# cross-check the generators themselves.

PARAM_COUNTS = {
    'sd14_unet': 859_520_964,
    'sd14_vae': 83_653_863,
    'clip_vit_l14': 427_616_513,
    'sdxl_unet': 2_567_463_684,
}


def param_count(manifest: Manifest) -> int:
    total = 0
    for key, shape in manifest.items():
        if key.endswith('position_ids'):
            continue  # non-parameter buffer
        n = 1
        for d in shape:
            n *= d
        total += n
    return total

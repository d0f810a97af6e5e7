"""Training subsystem: diffusion loss, full/LoRA fine-tuning, DP/TP mesh.

See :mod:`flexdiffuse_tpu.training.train` for design notes. Quick use::

    from flexdiffuse_tpu import training

    cfg = training.TrainConfig(learning_rate=1e-4)
    step, tx = training.make_train_step(unet, cfg)           # full model
    opt_state = tx.init(params)
    params, opt_state, loss = step(params, opt_state, latents, ctx, key)

    factors = training.init_lora(params, rank=8)             # LoRA-only
    lstep, ltx = training.make_lora_train_step(unet, params, cfg)
    ...
    training.export_lora_safetensors(factors, 'my_lora.safetensors')
"""
from flexdiffuse_tpu.training.checkpoint import TrainCheckpointer
from flexdiffuse_tpu.training.data import (EncodedDataset, encode_dataset,
                                           encode_dataset_sdxl,
                                           encode_images, find_items,
                                           load_pixels)
from flexdiffuse_tpu.training.dreambooth import (generate_class_images,
                                                  train_dreambooth)
from flexdiffuse_tpu.training.loop import train_full, train_lora
from flexdiffuse_tpu.training.textual_inversion import (OBJECT_TEMPLATES,
                                                        STYLE_TEMPLATES,
                                                        make_ti_train_step,
                                                        train_textual_inversion)
from flexdiffuse_tpu.training.train import (TrainConfig, diffusion_loss,
                                            ema_update,
                                            export_lora_safetensors,
                                            init_lora, make_lora_train_step,
                                            make_optimizer, make_train_step,
                                            merge_lora_params)

__all__ = [
    'TrainConfig', 'diffusion_loss', 'make_optimizer', 'make_train_step',
    'init_lora', 'merge_lora_params', 'make_lora_train_step',
    'export_lora_safetensors', 'ema_update',
    'EncodedDataset', 'find_items', 'load_pixels', 'encode_dataset',
    'train_lora', 'train_full', 'encode_images', 'encode_dataset_sdxl',
    'make_ti_train_step', 'train_textual_inversion',
    'OBJECT_TEMPLATES', 'STYLE_TEMPLATES',
    'train_dreambooth', 'generate_class_images',
    'TrainCheckpointer',
]

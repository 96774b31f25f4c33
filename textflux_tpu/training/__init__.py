from textflux_tpu.training.train import (  # noqa: F401
    TrainConfig,
    make_optimizer,
    make_train_step,
    attn_only_mask,
    lora_init,
    lora_merge,
)

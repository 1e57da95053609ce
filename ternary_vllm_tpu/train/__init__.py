from ternary_vllm_tpu.train.qat import (
    TrainConfig,
    lr_schedule,
    cross_entropy_loss,
    make_train_step,
    make_optimizer,
    clip_latent_params,
    biobjective_gradients,
    smooth_binary_stats,
)

__all__ = [
    "TrainConfig",
    "lr_schedule",
    "cross_entropy_loss",
    "make_train_step",
    "make_optimizer",
    "clip_latent_params",
    "biobjective_gradients",
    "smooth_binary_stats",
]

"""vip_cup_2022_tpu — TPU-native (JAX/XLA/Pallas/pjit) synthetic-image detection framework.

A from-scratch rebuild of the capabilities of the VIP Cup 2022 winning solution
(reference: awsaf49/vip-cup-2022): CSV-in/CSV-out ensemble inference over a zoo of
vision backbones, a model registry/factory, a torch-padding-faithful layer toolkit,
and a training stack — all redesigned for TPU (NHWC, bf16, static shapes, device
meshes, XLA collectives) instead of the reference's TF/Keras design.

Package layout:
    core/      typed config system, generic registry, dtype policy
    ops/       layer/op toolkit (convs, norms, attention, SE/ECA, MLP, resize, window)
    ops/pallas TPU Pallas kernels for the hot ops
    models/    model registry + factory + every backbone family
    data/      host decode + device preprocessing pipeline, TTA/train augments
    parallel/  jax.sharding Mesh setup, sharded inference/training helpers
    train/     optimizers, LR schedules, losses, SAM, trainer, checkpointing
    infer/     main.py-compatible CSV ensemble inference engine
    weights/   Keras-h5 / timm-torch -> JAX pytree weight converters
    utils/     profiling (throughput, FLOPs), misc
"""

__version__ = "0.1.0"

"""tpupose — a TPU-native 2D human pose estimation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
repository AI-sangbeom/2D-Human-Pose-Estimation (PyTorch/CUDA):

- top-down heatmap pose (SimpleBaseline-ResNet, HRNet) with on-device
  affine crops, Gaussian targets, and fused argmax+DARK decode
- single-stage multi-instance YOLO-style pose (DINOv3Pose equivalent:
  ConvNeXt/ViT backbone -> FeatureAdaptor -> SPPF -> PAN -> PoseHead)
- few-shot keypoint detection (FSKD), DeepPose regression, FCMAE
  masked-autoencoder pretraining (masked-dense, TPU-friendly)
- pose metric library (OKS-AP, PCK, PCKh, PCP, PCPm, PDJ, MPJPE,
  det-mAP, classification metrics)
- data-parallel training via jax.sharding.Mesh + jit sharding
  (the DDP/NCCL equivalent; reference: HPE/utils/dist.py)

Design rules: NHWC layouts, bf16 compute / fp32 params, static shapes
everywhere (padded+masked ragged data), collectives inserted by XLA from
sharding annotations.
"""

__version__ = "0.1.0"

"""legslam_tpu — TPU-native open-vocabulary Gaussian-Splatting SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of LEG-SLAM
(reference: AnonymousLEG-SLAM/LEG-SLAM): online 3D Gaussian Splatting mapping
with RGB + depth + 64-D language-feature fields, a DINOv2->PCA language
encoder, a Talk2DINO text-query branch, SLAM pose ingestion, eval harnesses
and a serving API — designed TPU-first (MXU-friendly compositing, static
shapes under jit, capacity-padded Gaussian store, sharding via jax.sharding).
"""

__version__ = "0.1.0"

from legslam_tpu import config  # noqa: F401

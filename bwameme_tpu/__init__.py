"""bwameme_tpu — a TPU-native (JAX/XLA/Pallas) BWA-MEME-class short-read aligner.

A brand-new implementation of the BWA-MEM alignment pipeline whose seeding stage
uses a learned index (P-RMI) over the reference suffix array, designed from
scratch for TPU: batched fixed-shape tensor pipelines, Pallas kernels for the
hot inner loops (last-mile suffix-array probe, banded Smith-Waterman
extension), and jax.sharding/shard_map scale-out with the index sharded by
suffix-array key range across devices.

Capability reference: kaist-ina/BWA-MEME (see SURVEY.md). This is not a port;
stage contracts and numerical semantics follow the reference so SAM output
matches, but every algorithm is restructured for the TPU execution model.
"""

__version__ = "0.1.0"

from bwameme_tpu.utils.config import MemOptions  # noqa: F401

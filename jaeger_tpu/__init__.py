"""jaeger-tpu: a TPU-native phage/prophage detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Jaeger
phage-detection tool (reference: Yasas1994/Jaeger). Contigs are fragmented
into fixed-length windows on the host, encoded as int8 base identifiers, and
streamed to TPU where 6-reading-frame codon translation, the multi-branch
masked CNN, and the reliability head all run as one fused XLA program.

Subpackages
-----------
seqops      host-side sequence handling: FASTA IO, DUST masking, windowing,
            the codon/crop contract.
ops         device-side encoders and compute primitives (jit/Pallas).
models      the masked layer zoo and the YAML-driven model builder.
parallel    mesh construction and sharding helpers.
infer       the batched, bucketed inference engine.
train       optimizers, losses, metrics and the branch training loops.
postprocess window->contig reduction, CRF smoothing, prophage segmentation,
            terminal repeats, report/TSV writers.
"""

__version__ = "0.1.0"

from jaeger_tpu.seqops import crop, maps
from jaeger_tpu.seqops.fasta import read_fasta, write_fasta_entry
from jaeger_tpu.seqops.windows import WindowBatch, window_indices, window_batches

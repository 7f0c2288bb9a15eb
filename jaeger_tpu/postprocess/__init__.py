from jaeger_tpu.postprocess import collect, helpers

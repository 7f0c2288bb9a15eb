from jaeger_tpu.infer.engine import InferenceEngine

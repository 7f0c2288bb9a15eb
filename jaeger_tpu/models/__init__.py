from jaeger_tpu.models import layers
from jaeger_tpu.models.builder import ModelBuilder, load_model_config

from fgn_tpu.config.core import Config, apply_typed_config

from fgn_tpu.models.fgn import FGN, FGNConfig
from fgn_tpu.models.resnet import ResNetC4, SharedRes5

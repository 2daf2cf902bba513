from neuray_tpu.models.blocks import (
    InstanceNorm, ReflectConv, BasicBlock, ResidualBlock, ConvELU, UpConv,
    upsample2x_align_corners,
)
from neuray_tpu.models.resunet import ResUNetLight, ResEncoder
from neuray_tpu.models.vis_encoder import DefaultVisEncoder, name2vis_encoder
from neuray_tpu.models.dist_decoder import (
    MixtureLogisticsDistDecoder, name2dist_decoder)
from neuray_tpu.models.ibrnet import IBRNetWithNeuRay, IBRNet
from neuray_tpu.models.agg_net import DefaultAggregationNet, name2agg_net
from neuray_tpu.models.init_net import DepthInitNet, name2init_net
from neuray_tpu.models.renderer import NeurayRenderer, RenderConfig
from neuray_tpu.models.ft import FtRenderer

# reference-compatible network registry (reference renderer.py:549-552)
name2network = {
    "neuray_gen": NeurayRenderer,
    "neuray_ft": FtRenderer,
}

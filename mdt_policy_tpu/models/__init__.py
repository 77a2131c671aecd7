from .blocks import (
    AdaLNZero,
    Attention,
    BiaslessLayerNorm,
    Block,
    ClipStyleProjection,
    ConditionedBlock,
    MAPAttention,
    MAPBlock,
    MeanPooling,
    MLP,
    NoiseBlock,
    RMSNorm,
    SigmaEmbedding,
    SinusoidalPosEmb,
    SwishGLU,
    TransformerDecoder,
    TransformerEncoder,
    TransformerFiLMDecoder,
    modulate,
)
from .mdtv_transformer import MDTVTransformer
from .mdt_transformer import MDTTransformer
from .perceiver import PerceiverResampler
from .blocks import (
    SiamneseDecoder,
    TransformerCrossAttentionEncoder,
    TransformerCrossAttentionOnlyEncoder,
    TransformerEncoderInterleaved,
    TransformerFiLMDecoderInterleaved,
    TransformerFiLMEncoder,
)
from .clip import CLIPTextTower, CLIPVisionTower, clip_normalize
from .encoders_misc import (
    CLIPVisionTokens,
    FourierFeatures,
    GaussianFourierEmbedding,
    NoEncoder,
    SinusoidalTimeEmbedding,
    VisionClipHead,
    VoltronMAPEncoder,
)
from .masked_decoder import MaskedTransformerImgDecoder
from .position_embeddings import (
    DynamicPositionBias,
    RelativePositionBias,
    RotaryEmbedding,
)
from .resnet import BesoResNetEncoder, ResNet18GN, SpatialSoftmax
from .voltron_vit import VoltronBlock, VoltronViT

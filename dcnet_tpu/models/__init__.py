from dcnet_tpu.models.attention import PhraseAttention
from dcnet_tpu.models.dcnet import DCNet, EvalOutputs, TrainOutputs
from dcnet_tpu.models.heads import ConvBNReLU, DenseBNReLU, FusionFCN, MappingLang
from dcnet_tpu.models.lstm import BiLSTMEncoder, convert_torch_lstm_params
from dcnet_tpu.models.darknet import (
    DarknetBackbone,
    LayerDef,
    load_darknet_weights,
    parse_darknet_cfg,
    random_darknet_weights_file,
    save_darknet_weights,
    upsample2,
    yolov3_layer_defs,
)

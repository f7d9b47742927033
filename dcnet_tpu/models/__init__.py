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

from acr_tpu.parser.center import decode_centers, nms_heatmap
from acr_tpu.parser.parse import parse_outputs, sample_at_index, split_params

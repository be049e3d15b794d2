from acr_tpu.io.params import (
    flatten_params,
    load_params,
    load_params_npz,
    load_params_orbax,
    save_params_npz,
    save_params_orbax,
    unflatten_params,
)
from acr_tpu.io.torch_names import map_flax_path

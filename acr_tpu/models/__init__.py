from acr_tpu.models.mano import ManoModel, load_mano_model, mano_forward

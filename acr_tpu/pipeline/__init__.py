from acr_tpu.pipeline.project import (
    estimate_translation_ls,
    kp2d_to_org_image,
    weak_persp_project,
)

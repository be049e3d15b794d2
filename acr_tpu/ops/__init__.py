from acr_tpu.ops.rotations import (
    axis_angle_to_quat,
    axis_angle_to_rotmat,
    quat_to_axis_angle,
    quat_to_rotmat,
    rot6d_to_rotmat,
    rot6d_to_axis_angle,
    rotmat_to_axis_angle,
    rotmat_to_quat,
)

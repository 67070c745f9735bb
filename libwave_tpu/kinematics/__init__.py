"""Kinematic models as pure scan steps (parity: wave_kinematics)."""

from libwave_tpu.kinematics.two_wheel import two_wheel_step, simulate_two_wheel  # noqa: F401
from libwave_tpu.kinematics.quadrotor import (  # noqa: F401
    QuadrotorParams,
    QuadrotorState,
    quadrotor_init,
    quadrotor_step,
    quadrotor_attitude_control,
    quadrotor_position_control,
)
from libwave_tpu.kinematics.gimbal import (  # noqa: F401
    GimbalParams,
    GimbalState,
    gimbal_init,
    gimbal_step,
    gimbal_track_target,
)
from libwave_tpu.kinematics.pose import Pose  # noqa: F401

from .abc import SDEStepOutput, DynamicsType
from .flow_match_euler import (
    FlowMatchEulerSDE,
    calculate_shift,
    build_flow_match_sigmas,
    convert_velocity_to_x0,
    convert_x0_to_velocity,
    sde_step,
)
from .registry import get_scheduler_class, register_scheduler
from .unipc import UniPCCarry, UniPCSDEScheduler, init_unipc_carry, unipc_eval_step

__all__ = [
    "SDEStepOutput",
    "DynamicsType",
    "FlowMatchEulerSDE",
    "calculate_shift",
    "build_flow_match_sigmas",
    "convert_velocity_to_x0",
    "convert_x0_to_velocity",
    "sde_step",
    "get_scheduler_class",
    "register_scheduler",
    "UniPCSDEScheduler",
    "UniPCCarry",
    "init_unipc_carry",
    "unipc_eval_step",
]

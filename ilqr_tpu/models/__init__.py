"""Model registry.

Replaces the reference's ``new DoubleIntegrator(...)`` / ``new Acrobot()``
construction in the CLI (ref: src/run_ilqr.cpp:22,41) with a name → Model map.
Register new models with :func:`register`.
"""

from __future__ import annotations

from typing import Dict

from ilqr_tpu.models.base import Model, euler_step, rk4_step, get_integrator
from ilqr_tpu.models import (
    acrobot, bicycle, double_integrator, cartpole, free_flyer, omni_thruster,
    pendulum, point_mass_3d, power_mass, quadrotor, thruster_ring,
)

_REGISTRY: Dict[str, Model] = {}


def register(model: Model) -> Model:
    if model.name in _REGISTRY:
        raise ValueError(f"model {model.name!r} already registered")
    _REGISTRY[model.name] = model
    return model


def get_model(name: str) -> Model:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; have {sorted(_REGISTRY)}"
        ) from None


def list_models():
    return sorted(_REGISTRY)


register(double_integrator.MODEL)
register(acrobot.MODEL)
register(bicycle.MODEL)
register(cartpole.MODEL)
register(free_flyer.MODEL)
register(pendulum.MODEL)
register(omni_thruster.MODEL)
register(point_mass_3d.MODEL)
register(power_mass.MODEL)
register(quadrotor.MODEL)
register(thruster_ring.MODEL)
register(thruster_ring.MODEL16)
register(thruster_ring.MODEL20)
register(thruster_ring.MODEL24)

__all__ = [
    "Model",
    "euler_step",
    "rk4_step",
    "get_integrator",
    "register",
    "get_model",
    "list_models",
]

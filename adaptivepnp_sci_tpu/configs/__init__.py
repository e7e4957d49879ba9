"""Declarative per-scene reconstruction configs (the reproduction recipes)."""

from adaptivepnp_sci_tpu.configs.scenes import (  # noqa: F401
    FASTDVD_SCENES,
    FFDNET_SCENES,
    SCENE_NAMES,
    SceneConfig,
    admm_config_for,
)

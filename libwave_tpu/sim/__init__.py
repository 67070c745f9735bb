"""Synthetic dataset generation (parity: wave_vision's VoDataset tooling)."""

from libwave_tpu.sim.vo_dataset import (  # noqa: F401
    VoDataset,
    VoSimParams,
    generate_vo_dataset,
    load_vo_dataset,
    save_vo_dataset,
)
from libwave_tpu.sim.euroc_sim import (  # noqa: F401
    EurocSimParams,
    generate_euroc_sequence,
)
from libwave_tpu.sim.render import (  # noqa: F401
    landmark_textures,
    render_frame,
    render_sequence,
)

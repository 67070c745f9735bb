"""Struct-of-arrays measurement containers.

Parity with the reference's wave_containers module: the Boost.MultiIndex
``MeasurementContainer`` (wave_containers/include/wave/containers/
measurement_container.hpp:47) and ``LandmarkMeasurementContainer``
(landmark_measurement_container.hpp:34), redesigned as fixed-capacity
struct-of-arrays ring buffers with validity masks so every query —
including the transparently-interpolating ``get`` — is a pure, jit-safe
gather/reduction that runs on device.
"""

from libwave_tpu.containers.measurement import (  # noqa: F401
    MeasurementBuffer,
    measurement_buffer,
    insert,
    erase,
    get_interpolated,
    get_time_window,
    get_all_from_sensor,
    size,
)
from libwave_tpu.containers.landmark import (  # noqa: F401
    LandmarkBuffer,
    landmark_buffer,
    insert_landmark,
    get_exact,
    get_landmark_ids,
    get_track,
    landmark_size,
)

"""Demo region: Altamont Pass, CA at 100-m resolution.

The config values reproduce the reference's Altamont example
(reference examples/example_altamontpass.py) so outputs are comparable;
the demo flow itself lives in examples/_demo.py. Offline environments fall
back to synthetic terrain automatically; WTK-backed modes are skipped when
no wind-data source is reachable.
"""

from ssrs_tpu import Config

try:  # package import (e.g. `from examples.example_altamontpass import ...`)
    from ._demo import mode_variants, run_demo
except ImportError:  # script run: `python examples/example_altamontpass.py`
    from _demo import mode_variants, run_demo

config_base = Config(
    run_name='altamont_pass',
    out_dir='./output',
    southwest_lonlat=(-121.98, 37.56),
    region_width_km=(60., 80.),
    resolution=100.,
    track_direction=0.,
    track_start_region=(2., 58., 0., 1.),
    track_count=1000,
)

_modes = mode_variants(config_base)
config_uniform_north = _modes['uniform']
config_snapshot_north = _modes['snapshot']
config_seasonal_north = _modes['seasonal']

if __name__ == '__main__':
    # seasonal left out of the default run, as in the reference script
    run_demo((config_uniform_north, config_snapshot_north))

"""Demo region: Appalachian Mountains, WV at 100-m resolution.

The config values reproduce the reference's Appalachian example
(reference examples/example_appalachian.py) so outputs are comparable;
the demo flow itself lives in examples/_demo.py.
"""

from ssrs_tpu import Config

try:  # package import (e.g. `from examples.example_appalachian import ...`)
    from ._demo import mode_variants, run_demo
except ImportError:  # script run: `python examples/example_appalachian.py`
    from _demo import mode_variants, run_demo

config_base = Config(
    run_name='appalachian',
    out_dir='./output',
    southwest_lonlat=(-79.7, 39.),
    region_width_km=(70., 60.),
    resolution=100.,
    track_direction=0.,
    track_start_region=(2., 68., 0., 1.),
    track_count=1000,
)

_modes = mode_variants(config_base)
config_uniform_north = _modes['uniform']
config_snapshot_north = _modes['snapshot']
config_seasonal_north = _modes['seasonal']

if __name__ == '__main__':
    # seasonal left out of the default run, as in the reference script
    run_demo((config_uniform_north, config_snapshot_north))

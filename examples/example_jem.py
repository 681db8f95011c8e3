"""Demo region: Wyoming around the Top of the World wind plant at 50-m
resolution.

The config values reproduce the reference's "jem" example
(reference examples/example_jem.py) so outputs are comparable; the demo
flow itself lives in examples/_demo.py.
"""

from ssrs_tpu import Config

try:  # package import (e.g. `from examples.example_jem import ...`)
    from ._demo import mode_variants, run_demo
except ImportError:  # script run: `python examples/example_jem.py`
    from _demo import mode_variants, run_demo

config_jem_base = Config(
    run_name='jem_wy',
    out_dir='./output',
    southwest_lonlat=(-106.21, 42.78),
    region_width_km=(50., 50.),
    resolution=50.,
    track_direction=0.,
    track_start_region=(2., 48., 0., 1.),
    track_count=1000,
)

_modes = mode_variants(config_jem_base)
config_jem_uniform_north = _modes['uniform']
config_jem_snapshot_north = _modes['snapshot']
config_jem_seasonal_north = _modes['seasonal']

if __name__ == '__main__':
    # seasonal left out of the default run, as in the reference script
    run_demo((config_jem_uniform_north, config_jem_snapshot_north))

"""SSRS-TPU simulation around Altamont Pass, CA at 100-m resolution.

Mirrors the reference example (examples/example_altamontpass.py): a base
Config composed into uniform/snapshot/seasonal variants with
dataclasses.replace, then the full simulate+plot suite. Offline
environments automatically fall back to synthetic terrain; snapshot and
seasonal modes need WTK connectivity and are skipped gracefully when it is
absent."""

from dataclasses import replace

from ssrs_tpu import Config, Simulator

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

config_uniform_north = replace(
    config_base,
    sim_mode='uniform',
    uniform_winddirn=270.,
    uniform_windspeed=10.,
)

config_snapshot_north = replace(
    config_base,
    sim_mode='snapshot',
    snapshot_datetime=(2010, 6, 17, 13),
)

config_seasonal_north = replace(
    config_base,
    sim_mode='seasonal',
    seasonal_start=(3, 1),
    seasonal_end=(6, 1),
    seasonal_timeofday='daytime',
    seasonal_count=8,
)

if __name__ == '__main__':
    configs_to_run = (
        config_uniform_north,
        config_snapshot_north,
        # config_seasonal_north,
    )
    for cfg in configs_to_run:
        try:
            sim = Simulator(cfg)
        except Exception as exc:
            print(f'Skipping {cfg.sim_mode} mode: {exc}')
            continue
        sim.simulate_tracks()
        sim.plot_terrain_features()
        sim.plot_wtk_layers()
        sim.plot_directional_potentials()
        sim.plot_simulated_tracks()
        sim.plot_presence_map()

"""SSRS-TPU simulation over the Appalachian Mountains, WV at 100-m
resolution (mirrors examples/example_appalachian.py in the reference)."""

from dataclasses import replace

from ssrs_tpu import Config, Simulator

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

"""SSRS-TPU simulation in Wyoming around the Top of the World wind plant
at 50-m resolution (mirrors examples/example_jem.py in the reference)."""

from dataclasses import replace

from ssrs_tpu import Config, Simulator

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

config_jem_uniform_north = replace(
    config_jem_base,
    sim_mode='uniform',
    uniform_winddirn=270.,
    uniform_windspeed=10.,
)

config_jem_snapshot_north = replace(
    config_jem_base,
    sim_mode='snapshot',
    snapshot_datetime=(2010, 6, 17, 13),
)

config_jem_seasonal_north = replace(
    config_jem_base,
    sim_mode='seasonal',
    seasonal_start=(3, 1),
    seasonal_end=(6, 1),
    seasonal_timeofday='daytime',
    seasonal_count=8,
)

if __name__ == '__main__':
    configs_to_run = (
        config_jem_uniform_north,
        config_jem_snapshot_north,
        # config_jem_seasonal_north,
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

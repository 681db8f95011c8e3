"""Plotting mixin for the Simulator — the reference's ~15 plot methods
(ssrs/simulator.py:305-329, 393-506, 508-592, 641-709, 794-804) with
identical figure artifacts and naming."""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np

from .utils import create_gis_axis


class PlottingMixin:
    """Plot methods shared by Simulator; relies on its attributes/naming."""

    # ---- terrain ---------------------------------------------------------

    def plot_terrain_features(self, plot_turbs=True, show=False) -> None:
        """(ssrs/simulator.py:641-646)"""
        print('Plotting terrain layers..', flush=True)
        self.plot_terrain_elevation(plot_turbs, show)
        self.plot_terrain_slope(plot_turbs, show)
        self.plot_terrain_aspect(plot_turbs, show)

    def plot_terrain_elevation(self, plot_turbs=True, show=False) -> None:
        import matplotlib.pyplot as plt
        elevation = self.get_terrain_elevation()
        fig, axs = plt.subplots(figsize=self.fig_size)
        cm = axs.imshow(elevation / 1000., cmap='terrain',
                        extent=self.extent, origin='lower')
        cbar, _ = create_gis_axis(fig, axs, cm, self.km_bar)
        cbar.set_label('Altitude (km)')
        if plot_turbs:
            self.plot_turbine_locations(axs)
        self.save_fig(fig, os.path.join(self.fig_dir, 'elevation.png'),
                      show)

    def plot_terrain_slope(self, plot_turbs=True, show=False) -> None:
        import matplotlib.pyplot as plt
        slope = self.get_terrain_slope()
        fig, axs = plt.subplots(figsize=self.fig_size)
        cm = axs.imshow(slope, cmap='magma_r', extent=self.extent,
                        origin='lower')
        cbar, _ = create_gis_axis(fig, axs, cm, self.km_bar)
        cbar.set_label('Slope (Degrees)')
        if plot_turbs:
            self.plot_turbine_locations(axs)
        self.save_fig(fig, os.path.join(self.fig_dir, 'slope.png'), show)

    def plot_terrain_aspect(self, plot_turbs=True, show=False) -> None:
        import matplotlib.pyplot as plt
        aspect = self.get_terrain_aspect()
        fig, axs = plt.subplots(figsize=self.fig_size)
        cm = axs.imshow(aspect, cmap='hsv', extent=self.extent,
                        origin='lower', vmin=0, vmax=360.)
        cbar, _ = create_gis_axis(fig, axs, cm, self.km_bar)
        cbar.set_label('Aspect (Degrees)')
        if plot_turbs:
            self.plot_turbine_locations(axs)
        self.save_fig(fig, os.path.join(self.fig_dir, 'aspect.png'), show)

    # ---- updrafts & WTK --------------------------------------------------

    def plot_updrafts(self, apply_threshold=True, plot_turbs=True,
                      show=False) -> None:
        """(ssrs/simulator.py:437-461)"""
        import matplotlib.pyplot as plt
        print('Plotting updraft fields..')
        for case_id in self.case_ids:
            updrafts = self.load_updrafts(case_id, apply_threshold)
            for real_id, updraft in enumerate(updrafts):
                fig, axs = plt.subplots(figsize=self.fig_size)
                maxval = min(max(1, int(round(float(np.mean(updraft))))), 5)
                cm = axs.imshow(updraft, cmap='viridis',
                                extent=self.extent, origin='lower',
                                vmin=0, vmax=maxval)
                cbar, _ = create_gis_axis(fig, axs, cm, self.km_bar)
                lbl = 'Orographic updraft (m/s)' if real_id == 0 \
                    else 'Orographic + Thermal (m/s)'
                if apply_threshold:
                    lbl += ', usable'
                cbar.set_label(lbl)
                if plot_turbs:
                    self.plot_turbine_locations(axs)
                fname = (f'{self._get_id_string(case_id, real_id)}'
                         '_updraft.png')
                self.save_fig(fig, os.path.join(self.mode_fig_dir, fname),
                              show)

    def plot_wtk_layers(self, plot_turbs=True, show=False) -> None:
        """(ssrs/simulator.py:463-486)"""
        import matplotlib.pyplot as plt
        try:
            for dtime, case_id in zip(self.dtimes, self.case_ids):
                wtk_df = self.wtk.get_dataframe_for_this_time(dtime)
                for wtk_lyr in self.wtk.varnames:
                    vardata = wtk_df.loc[:, wtk_lyr].values.flatten()
                    interp = self._interpolate_wtk_vardata(vardata)
                    fig, axs = plt.subplots(figsize=self.fig_size)
                    cm = axs.imshow(interp, cmap='viridis', origin='lower',
                                    extent=self.extent, alpha=0.75)
                    cbar, _ = create_gis_axis(fig, axs, cm, self.km_bar)
                    cbar.set_label(wtk_lyr)
                    axs.set_xlim([self.extent[0], self.extent[1]])
                    axs.set_ylim([self.extent[2], self.extent[3]])
                    if plot_turbs:
                        self.plot_turbine_locations(axs)
                    fname = f'{case_id}_{wtk_lyr}.png'
                    self.save_fig(fig, os.path.join(self.mode_fig_dir,
                                                    fname), show)
        except AttributeError:
            print('No WTK data to plot in uniform mode!')

    def plot_updraft_threshold_function(self, show=False) -> None:
        """(ssrs/simulator.py:794-804)"""
        import matplotlib.pyplot as plt
        from .fields import get_above_threshold_speed
        fig, axs = plt.subplots(figsize=(5, 3))
        uspeed = np.linspace(0, np.ceil(self.updraft_threshold) + 1, 100)
        axs.plot(uspeed, np.asarray(get_above_threshold_speed(
            uspeed.astype(np.float32), self.updraft_threshold)))
        axs.grid(True)
        axs.set_xlabel('Updraft speed (m/s)')
        axs.set_ylabel('Threshold function')
        self.save_fig(fig, os.path.join(self.fig_dir,
                                        'threshold_function.png'), show)

    # ---- potential -------------------------------------------------------

    def plot_directional_potentials(self, plot_turbs=True,
                                    show=False) -> None:
        """(ssrs/simulator.py:305-329)"""
        import matplotlib.pyplot as plt
        if self.movement_model != 'fluidflow':
            return
        print('Plotting directional potential..')
        for case_id in self.case_ids:
            updrafts = self.load_updrafts(case_id, apply_threshold=True)
            for real_id, _ in enumerate(updrafts):
                fname = self._get_potential_fname(case_id, real_id,
                                                  self.mode_data_dir)
                potential = np.load(f'{fname}.npy')
                fig, axs = plt.subplots(figsize=self.fig_size)
                lvls = np.linspace(0., np.amax(potential), 11)
                cm = axs.contourf(potential, lvls, cmap='cividis',
                                  origin='lower', extent=self.extent)
                cbar, _ = create_gis_axis(fig, axs, cm, self.km_bar)
                cbar.set_label('Directional potential')
                if plot_turbs:
                    self.plot_turbine_locations(axs)
                axs.set_xlim([self.extent[0], self.extent[1]])
                axs.set_ylim([self.extent[2], self.extent[3]])
                fname = self._get_potential_fname(case_id, real_id,
                                                  self.mode_fig_dir)
                self.save_fig(fig, f'{fname}.png', show)

    # ---- tracks ----------------------------------------------------------

    def plot_simulated_tracks(self, plot_turbs=True, show=False) -> None:
        """(ssrs/simulator.py:393-432)"""
        import matplotlib.pyplot as plt
        import matplotlib.patches as mpatches
        print('Plotting simulated tracks..')
        lwidth = 0.15 if int(self.track_count) > 251 else 0.4
        elevation = self.get_terrain_elevation()
        xgrid, ygrid = self.get_terrain_grid()
        for case_id in self.case_ids:
            updrafts = self.load_updrafts(case_id, apply_threshold=True)
            for real_id, _ in enumerate(updrafts):
                fname = self._get_tracks_fname(case_id, real_id,
                                               self.mode_data_dir)
                if not os.path.exists(f'{fname}.pkl'):
                    print(f'{fname}.pkl absent (large run: tracks not '
                          'materialized); skipping track plot')
                    continue
                fig, axs = plt.subplots(figsize=self.fig_size)
                axs.imshow(elevation, alpha=0.75, cmap='Greys',
                           origin='lower', extent=self.extent)
                with open(f'{fname}.pkl', 'rb') as fobj:
                    tracks = pickle.load(fobj)
                for itrack in tracks:
                    axs.plot(xgrid[itrack[0, 1]], ygrid[itrack[0, 0]],
                             'b.', markersize=1.0)
                    axs.plot(xgrid[itrack[:, 1]], ygrid[itrack[:, 0]],
                             '-r', linewidth=lwidth, alpha=0.5)
                create_gis_axis(fig, axs, None, self.km_bar)
                if plot_turbs:
                    self.plot_turbine_locations(axs)
                left = self.extent[0] + self.track_start_region[0] * 1000.
                bottom = self.extent[2] + self.track_start_region[2] * 1000.
                width = (self.track_start_region[1]
                         - self.track_start_region[0])
                hght = (self.track_start_region[3]
                        - self.track_start_region[2])
                rect = mpatches.Rectangle((left, bottom), width * 1000.,
                                          hght * 1000., alpha=0.2,
                                          edgecolor='none', facecolor='b')
                axs.add_patch(rect)
                axs.set_xlim([self.extent[0], self.extent[1]])
                axs.set_ylim([self.extent[2], self.extent[3]])
                fname = self._get_tracks_fname(case_id, real_id,
                                               self.mode_fig_dir)
                self.save_fig(fig, f'{fname}.png', show)

    # ---- presence --------------------------------------------------------

    def _plot_presence(self, in_prob, in_val, plot_turbs,
                       wfarm_level=False):
        """(ssrs/simulator.py:491-506)"""
        import matplotlib.pyplot as plt
        from matplotlib.colors import LogNorm
        fig, axs = plt.subplots(figsize=self.fig_size)
        in_prob = np.array(in_prob)
        in_prob[in_prob <= in_val] = 0.
        axs.imshow(in_prob, extent=self.extent, origin='lower',
                   cmap='Reds', alpha=0.75,
                   norm=LogNorm(vmin=in_val, vmax=1.0))
        create_gis_axis(fig, axs, None,
                        1. if wfarm_level else self.km_bar)
        if plot_turbs:
            self.plot_turbine_locations(axs)
        axs.set_xlim([self.extent[0], self.extent[1]])
        axs.set_ylim([self.extent[2], self.extent[3]])
        return fig, axs

    def plot_presence_map(self, plot_turbs=True, radius: float = 1000.,
                          show=False, minval=0.1,
                          plot_all: bool = False) -> None:
        """(ssrs/simulator.py:508-550)"""
        print('Plotting presence density map..')
        from .agents import smooth_presence
        krad = min(max(radius / self.resolution, 2),
                   min(self.gridsize) / 2)
        summary_prob = np.zeros(self.gridsize, np.float64)
        for case_id in self.case_ids:
            updrafts = self.load_updrafts(case_id, apply_threshold=True)
            case_prob = np.zeros(self.gridsize, np.float64)
            for real_id, _ in enumerate(updrafts):
                counts = self.get_presence_counts(case_id, real_id)
                prprob = np.asarray(smooth_presence(
                    counts.astype(np.int32), int(round(krad))))
                prprob = prprob / np.amax(prprob)
                case_prob += prprob
                if plot_all:
                    fig, _ = self._plot_presence(prprob, minval,
                                                 plot_turbs)
                    fname = self._get_presence_fname(case_id, real_id,
                                                     self.mode_fig_dir)
                    self.save_fig(fig, f'{fname}.png', show)
            case_prob /= np.amax(case_prob)
            summary_prob += case_prob
            fig, _ = self._plot_presence(case_prob, minval, plot_turbs)
            fname = f'{self._get_id_string(case_id)}_presence.png'
            self.save_fig(fig, os.path.join(self.mode_fig_dir, fname),
                          show)
        summary_prob /= np.amax(summary_prob)
        fname = os.path.join(self.mode_data_dir, 'summary_presence')
        np.save(f'{fname}.npy', summary_prob.astype(np.float32))
        if len(self.case_ids) > 1:
            fig, _ = self._plot_presence(summary_prob, minval, plot_turbs)
            self.save_fig(fig, os.path.join(self.mode_fig_dir,
                                            'summary_presence.png'), show)

    def plot_windplant_presence_map(self, pname, radius: float = 100.,
                                    plot_turbs=True, show=False,
                                    minval=0.05, pad: float = 2000.
                                    ) -> None:
        """(ssrs/simulator.py:557-592)"""
        print('Plotting presence density map..')
        from .agents import smooth_presence
        xloc, yloc = self.turbines.get_locations_for_this_project(pname)
        krad = min(max(radius / self.resolution, 2),
                   min(self.gridsize) / 2)
        summary_prob = np.zeros(self.gridsize, np.float64)
        for case_id in self.case_ids:
            updrafts = self.load_updrafts(case_id, apply_threshold=True)
            case_prob = np.zeros(self.gridsize, np.float64)
            for real_id, _ in enumerate(updrafts):
                counts = self.get_presence_counts(case_id, real_id)
                prprob = np.asarray(smooth_presence(
                    counts.astype(np.int32), int(round(krad))))
                prprob = prprob / np.amax(prprob)
                case_prob += prprob
            case_prob /= np.amax(case_prob)
            summary_prob += case_prob
        summary_prob /= np.amax(summary_prob)
        fig, axs = self._plot_presence(summary_prob, minval, plot_turbs,
                                       wfarm_level=True)
        axs.set_xlim([min(xloc) - pad, max(xloc) + pad])
        axs.set_ylim([min(yloc) - pad, max(yloc) + pad])
        self.save_fig(fig, os.path.join(self.mode_fig_dir,
                                        f'presence_{pname}.png'), show)

    # ---- turbines & misc -------------------------------------------------

    def plot_turbine_locations(self, axs, set_label: bool = True,
                               draw_box: bool = False) -> None:
        """(ssrs/simulator.py:687-709)"""
        import matplotlib.patches as mpatches
        if self.turbines.dframe is None:
            return
        for i, pname in enumerate(self.turbines.get_project_names()):
            mrkr = self.turbine_mrkr_styles[
                i % len(self.turbine_mrkr_styles)]
            xlocs, ylocs = \
                self.turbines.get_locations_for_this_project(pname)
            axs.plot(xlocs, ylocs, mrkr,
                     markersize=self.turbine_mrkr_size, alpha=0.75,
                     label=pname if set_label else '')
            if draw_box:
                width = max(xlocs) - min(xlocs) + 2
                height = max(ylocs) - min(ylocs) + 2
                rect = mpatches.Rectangle(
                    (min(xlocs) - 1, min(ylocs) - 1), width, height,
                    linewidth=1, edgecolor='k', facecolor='none',
                    zorder=20)
                axs.add_patch(rect)

    def save_fig(self, fig, fpath: str, show_fig: bool = False) -> None:
        """(ssrs/simulator.py:754-758)"""
        import matplotlib.pyplot as plt
        if not show_fig:
            fig.savefig(fpath, bbox_inches='tight', dpi=self.fig_dpi)
            plt.close(fig)

"""Common host-side utilities.

Mirrors ssrs/utils.py: sunrise/sunset, GIS figure axes, extent/bounds,
directory helpers, elapsed-time formatting. astral/timezonefinder are not
installed here, so sunrise/sunset uses the NOAA solar-position algorithm
directly with a longitude-derived UTC offset (exact solar math; timezone
offset approximated as round(lon/15), which is what the hour-granular
seasonal sampler actually needs)."""

from __future__ import annotations

import errno
import math
import os
import shutil
from datetime import date, datetime, time, timedelta
from typing import List, Tuple

import numpy as np

from .core.timing import elapsed_str as get_elapsed_time  # noqa: F401


# ---- solar calculations (NOAA SPA simplified; Meeus) ----------------------

def _solar_noon_and_halfday(lon: float, lat: float,
                            this_date: date) -> Tuple[float, float]:
    """Solar noon (fractional UTC hours) and half-day length (hours)."""
    n = this_date.toordinal() - date(2000, 1, 1).toordinal()
    # mean solar time approximations (NOAA)
    jstar = n - lon / 360.0
    m = math.radians((357.5291 + 0.98560028 * jstar) % 360.)
    c = (1.9148 * math.sin(m) + 0.0200 * math.sin(2 * m)
         + 0.0003 * math.sin(3 * m))
    lam = math.radians((math.degrees(m) + c + 180. + 102.9372) % 360.)
    j_transit = 2451545.0 + jstar + 0.0053 * math.sin(m) \
        - 0.0069 * math.sin(2 * lam)
    decl = math.asin(math.sin(lam) * math.sin(math.radians(23.4397)))
    phi = math.radians(lat)
    cos_h = ((math.sin(math.radians(-0.833)) - math.sin(phi)
              * math.sin(decl)) / (math.cos(phi) * math.cos(decl)))
    cos_h = min(max(cos_h, -1.0), 1.0)
    halfday_hours = math.degrees(math.acos(cos_h)) / 15.0
    # 2451545.0 + n is 12:00 UTC on this date; offset to transit in hours
    noon_utc = 12.0 + (j_transit - (2451545.0 + n)) * 24.0
    return noon_utc, halfday_hours


def get_sunrise_sunset_time(this_lonlat: Tuple[float, float],
                            this_date: date) -> Tuple[time, time]:
    """Local-time sunrise/sunset (API parity with ssrs/utils.py:15-29).

    Local timezone offset is approximated as round(lon / 15) hours; the
    seasonal sampler consumes only whole hours of these times
    (ssrs/simulator.py:733-748), so this is adequate without
    timezonefinder."""
    if not isinstance(this_date, date):
        raise ValueError('Provide a valid datetime.date object')
    lon, lat = this_lonlat
    noon_utc, halfday = _solar_noon_and_halfday(lon, lat, this_date)
    tz_offset = round(lon / 15.0)
    rise = noon_utc - halfday + tz_offset
    sset = noon_utc + halfday + tz_offset

    def to_time(hours: float) -> time:
        hours = hours % 24.0
        hh = int(hours)
        mm = int((hours - hh) * 60)
        ss = int(((hours - hh) * 60 - mm) * 60)
        return time(hh, mm, ss)

    return to_time(rise), to_time(sset)


def get_seasonal_datetimes_list(years: List[int],
                                seasonal_start: Tuple[int, int],
                                seasonal_end: Tuple[int, int],
                                timeofday: str,
                                count: int,
                                lonlat: Tuple[float, float],
                                rng: np.random.Generator
                                ) -> List[datetime]:
    """Sample unique seasonal datetimes (ssrs/simulator.py:718-752),
    driven by a seeded Generator instead of the unseeded stdlib random."""
    chosen = set()
    guard = 0
    while len(chosen) < count:
        guard += 1
        if guard > 100 * count + 1000:
            raise RuntimeError('seasonal datetime sampling did not '
                               'converge; widen the season window')
        year = int(rng.choice(years))
        start_date = datetime(year, *seasonal_start)
        end_date = datetime(year, *seasonal_end)
        span = (end_date - start_date).total_seconds()
        rnd = start_date + timedelta(seconds=float(rng.random()) * span)
        rnd = rnd.replace(microsecond=0, second=0, minute=0)
        srise, sset = get_sunrise_sunset_time(lonlat, rnd.date())
        daytime = np.arange(srise.hour + 1, sset.hour + 1)
        split = np.array_split(daytime, 3)
        tod = timeofday.lower()
        if tod == 'morning':
            hours = list(split[0])
        elif tod == 'afternoon':
            hours = list(split[1])
        elif tod == 'evening':
            hours = list(split[2])
        elif tod == 'daytime':
            hours = list(daytime)
        else:
            raise ValueError(f'Invalid time of day:{timeofday}\n'
                             'Options: morning, afternoon, evening, '
                             'daytime')
        rnd = rnd.replace(hour=int(rng.choice(hours)))
        chosen.add(rnd)
    return list(chosen)


# ---- figures --------------------------------------------------------------

def create_gis_axis(cur_fig, cur_ax, cur_cm=None, km_bar: float = 10.):
    """GIS styling: scale bar, north arrow, colorbar, legend
    (ssrs/utils.py:32-71)."""
    import matplotlib.pyplot as plt
    from mpl_toolkits.axes_grid1.anchored_artists import AnchoredSizeBar

    plt.tick_params(axis='both', which='both', bottom=False, top=False,
                    labelbottom=False, right=False, left=False,
                    labelleft=False)
    b_txt = str(int(km_bar)) + ' km'
    bar = AnchoredSizeBar(cur_ax.transData, km_bar * 1000., b_txt, 3,
                          pad=0.1, size_vertical=0.1, frameon=False)
    cur_ax.add_artist(bar)
    arrowprops = dict(fc='k', ec='k', alpha=0.9, lw=2.1,
                      arrowstyle='<-,head_length=1.0')
    cur_ax.annotate('N', xy=(0.03, 0.925), xycoords='axes fraction',
                    xytext=(0.03, 0.99), textcoords='axes fraction',
                    arrowprops=arrowprops,
                    bbox=dict(pad=-4, facecolor='none', edgecolor='none'),
                    ha='center', va='top', alpha=0.9)
    if cur_cm:
        cbar = cur_fig.colorbar(cur_cm, ax=cur_ax, pad=0.01, shrink=0.8,
                                aspect=40)
        cbar.outline.set_visible(False)
        cbar.ax.tick_params(size=0)
    else:
        cbar = None
    _, labels = cur_ax.get_legend_handles_labels()
    if labels:
        w = cur_fig.get_size_inches()[0]
        legend = cur_ax.legend(bbox_to_anchor=(0, 1.005),
                               ncol=int(w // 2), loc='lower left',
                               markerscale=2, columnspacing=1.0,
                               handletextpad=0.0, borderaxespad=0.,
                               fontsize='small')
    else:
        legend = None
    cur_ax.set_aspect('equal', adjustable='box')
    return cbar, legend


# ---- bounds & filesystem ---------------------------------------------------

def get_extent_from_bounds(bounds, from_origin: bool = False,
                           in_km: bool = False):
    """Matplotlib extent from bounds (ssrs/utils.py:74-85)."""
    extent = (bounds[0], bounds[2], bounds[1], bounds[3])
    if from_origin:
        extent = (0., extent[1] - bounds[0], 0., extent[3] - extent[2])
    if in_km:
        extent = [v / 1000. for v in extent]
    return extent


def makedir_if_not_exists(dirname: str) -> None:
    try:
        os.makedirs(dirname)
    except OSError as exc:
        if exc.errno != errno.EEXIST:
            raise


def remove_all_dirs_in_this_dir(dname: str) -> None:
    if os.path.isdir(dname):
        for entry in os.scandir(dname):
            if entry.is_dir():
                shutil.rmtree(entry.path)


def empty_this_directory(dirname: str) -> None:
    for fname in os.listdir(dirname):
        os.remove(os.path.join(dirname, fname))


def pretty_str(label, arr) -> str:
    """Pretty-print an array assignment (ssrs/utils.py:126-167)."""
    def is_col(a):
        try:
            return a.shape[0] > 1 and a.shape[1] == 1
        except (AttributeError, IndexError):
            return False

    label = '' if label is None else label
    if label:
        label += ' = '
    if is_col(arr):
        return label + str(arr.T).replace('\n', '') + '.T'
    rows = str(arr).split('\n')
    if not rows:
        return ''
    out = label + rows[0]
    pad = ' ' * len(label)
    for line in rows[1:]:
        out += '\n' + pad + line
    return out

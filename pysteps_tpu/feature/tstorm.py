"""
Multi-threshold thunderstorm-cell detection
(reference: pysteps/feature/tstorm.py:51-316; Feldmann et al. 2021).

The reference uses scikit-image (h_maxima, watershed, find_contours);
here the same algorithm is built on scipy.ndimage (grayscale
reconstruction for h-maxima, watershed_ift for the breakup) and a simple
boundary tracer for contours.  Cell properties are returned as a pandas
DataFrame with the reference's column contract.
"""

import numpy as np
import pandas as pd
from scipy import ndimage as ndi


def _h_maxima(image, h, footprint):
    """h-maxima via grayscale reconstruction by dilation
    (replacement for skimage.morphology.h_maxima)."""
    seed = image - h
    mask = image
    rec = seed.copy()
    # iterative geodesic dilation until stable (domains are small)
    for _ in range(512):
        prev = rec
        rec = np.minimum(ndi.grey_dilation(rec, footprint=footprint), mask)
        if np.allclose(rec, prev):
            break
    return ((image - rec) >= h).astype(np.uint8)


def _watershed(ref, markers):
    """Marker-based watershed on -ref using watershed_ift."""
    ref_norm = ref - np.nanmin(ref)
    denom = max(np.nanmax(ref_norm), 1e-6)
    inverted = (255 - 255 * ref_norm / denom).astype(np.uint16)
    return ndi.watershed_ift(inverted.astype(np.uint16), markers.astype(np.int32))


def _find_contours(binary):
    """Boundary pixels of a binary region as an (N, 2) array of (row, col)
    coordinates (stand-in for skimage.measure.find_contours)."""
    eroded = ndi.binary_erosion(binary)
    boundary = binary.astype(bool) & ~eroded
    coords = np.argwhere(boundary)
    return [coords.astype(float)] if coords.size else []


def longdistance(loc_max, mindis):
    """Drop maxima closer than ``mindis`` to an earlier maximum
    (reference: tstorm.py:217)."""
    y_max = np.asarray(loc_max[0])
    x_max = np.asarray(loc_max[1])
    n = 0
    while n < len(y_max):
        dis = np.sqrt((x_max[n] - x_max) ** 2 + (y_max[n] - y_max) ** 2)
        close = np.where(dis < mindis)[0]
        close = close[close > n]
        if len(close) > 0:
            x_max = np.delete(x_max, close)
            y_max = np.delete(y_max, close)
        n += 1
    return y_max, x_max


def breakup(ref, minval, maxima):
    """Watershed segmentation into per-maximum areas
    (reference: tstorm.py:202)."""
    ref_t = np.full(ref.shape, minval)
    ref_t[ref > minval] = ref[ref > minval]
    markers = ndi.label(maxima)[0]
    areas = _watershed(np.nan_to_num(ref_t, nan=minval), markers)
    return areas, areas


def get_profile(areas, binary, ref, loc_max, time, minref, output_splits_merges=False):
    """Cell properties DataFrame (reference: tstorm.py:241)."""
    cells = areas * binary
    cell_labels = cells[loc_max]
    labels = np.zeros(cells.shape)
    rows = []
    for n, cell_label in enumerate(cell_labels):
        if cell_label == 0:
            continue
        this_id = n + 1
        ys, xs = np.where(cells == cell_label)
        cell_unique = (cells == cell_label).astype(float)
        rows.append(
            {
                "ID": this_id,
                "time": time,
                "x": xs,
                "y": ys,
                "cen_x": int(np.round(np.nanmean(xs))),
                "cen_y": int(np.round(np.nanmean(ys))),
                "max_ref": np.nanmax(ref[ys, xs]),
                "cont": _find_contours(cell_unique),
                "area": len(xs),
            }
        )
        if output_splits_merges:
            rows[-1].update(
                splitted=None, split_IDs=None, merged=None,
                merged_IDs=None, results_from_split=None, will_merge=None,
            )
        labels[cells == cell_label] = this_id

    columns = ["ID", "time", "x", "y", "cen_x", "cen_y", "max_ref", "cont", "area"]
    if output_splits_merges:
        columns += [
            "splitted", "split_IDs", "merged", "merged_IDs",
            "results_from_split", "will_merge",
        ]
    df = pd.DataFrame(rows, columns=columns)
    if output_splits_merges and len(df):
        df["split_IDs"] = df["split_IDs"].astype("object")
        df["merged_IDs"] = df["merged_IDs"].astype("object")
    return df, labels


def detection(
    input_image,
    max_num_features=None,
    minref=35,
    maxref=48,
    mindiff=6,
    minsize=50,
    minmax=41,
    mindis=10,
    output_feat=False,
    output_splits_merges=False,
    time="000000000",
    **kwargs,
):
    """Multi-threshold cell detection (reference: tstorm.py:51).

    Returns (cells DataFrame, labels array), or (N, 2) centroid coordinates
    if ``output_feat``.
    """
    input_image = np.asarray(input_image, float)
    filt_image = np.zeros(input_image.shape)
    wet = input_image >= minref
    filt_image[wet] = input_image[wet]
    filt_image[input_image > maxref] = maxref

    # saturated cores count as maxima
    max_image = np.zeros(filt_image.shape)
    max_image[filt_image == maxref] = 1
    labels_sat, n_groups = ndi.label(max_image)
    for n in range(1, n_groups + 1):
        indx, indy = np.where(labels_sat == n)
        if len(indx) > 3:
            max_image[indx[0], indy[0]] = 2
    filt_image[max_image == 2] = maxref + 1

    binary = (filt_image > 0).astype(float)
    labels, n_groups = ndi.label(binary)
    for n in range(1, n_groups + 1):
        ind = np.where(labels == n)
        maxval = np.nanmax(input_image[ind])
        if len(ind[0]) < minsize or maxval < minmax:
            binary[labels == n] = 0
            labels[labels == n] = 0
    filt_image = filt_image * binary

    elem = mindis - 1 if mindis % 2 == 0 else mindis
    struct = np.ones((elem, elem))
    if np.nanmax(filt_image) < minref:
        maxima = np.zeros(filt_image.shape)
    else:
        maxima = _h_maxima(filt_image, mindiff, struct)
    loc_max = np.where(maxima > 0)
    loc_max = longdistance(loc_max, mindis)

    # discard regions without a maximum
    i_cell = labels[loc_max]
    for n in np.unique(labels)[1:]:
        if n not in i_cell:
            binary[labels == n] = 0
            labels[labels == n] = 0

    maxima_dis = np.zeros(maxima.shape)
    maxima_dis[loc_max] = 1
    areas, _ = breakup(input_image, float(np.nanmin(input_image)), maxima_dis)
    cells_id, labels_out = get_profile(
        areas, binary, input_image, loc_max, time, minref,
        output_splits_merges=output_splits_merges,
    )

    idx = (
        np.argsort(cells_id.area.to_numpy())[::-1]
        if max_num_features is not None and len(cells_id)
        else None
    )
    if not output_feat:
        if idx is None:
            return cells_id, labels_out
        for i in idx[max_num_features:]:
            labels_out[labels_out == cells_id.ID.iloc[i]] = 0
        return cells_id.iloc[idx[:max_num_features]], labels_out
    if not len(cells_id):
        return np.zeros((0, 2))
    out = np.column_stack([cells_id.cen_x.to_numpy(), cells_id.cen_y.to_numpy()])
    if idx is not None:
        out = out[idx[:max_num_features]]
    return out

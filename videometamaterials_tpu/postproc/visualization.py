"""Publication-style rendering of predicted/FEM deformation videos.

Re-design of create_visualization (src/utils.py:309-486): reconstruct the
topology from near-zero u2 pixels, estimate the stress-strain response from
the pixel fields (nominal-stress correction and linear zero-shift), and write
jet-colormapped RGBA GIFs (Lagrangian and remapped-Eulerian), a compression
mask, the estimated curve CSV, and a colorbar legend PNG — same files, same
directory layout (<path>/visualization_<row>-<col>/)."""

from __future__ import annotations

import os

import numpy as np

from videometamaterials_tpu.postproc.remap import (
    convert_isolated_pixels_gif,
    crop_gif,
    remove_artifacts,
    update_pixel_positions,
)


def _norm(arr, lo, hi):
    return (arr - lo) / (hi - lo)


def _unnorm(arr, lo, hi):
    return arr * (hi - lo) + lo


def create_visualization(path: str, frame_ranges: str, row: int, col: int,
                         ref_frame: str, atol: float = 0.02,
                         disp_compression: bool = True) -> str:
    import imageio
    import matplotlib.pyplot as plt

    s_22_idx = 2 if ref_frame == "eulerian" else 3

    fr = np.genfromtxt(frame_ranges, delimiter=",")
    fr = fr[~np.isnan(fr).any(axis=1)] if fr.ndim > 1 else fr[None, :]
    if fr.ndim == 1:
        fr = fr[None, :]

    if ref_frame == "lagrangian":
        min_u_1, max_u_1 = fr[:, 0].min(), fr[:, 1].max()
        min_u_2, max_u_2 = fr[:, 2].min(), fr[:, 3].max()
        fr = fr[:, -4:]

    if ref_frame == "eulerian":
        data_pred_bin = crop_gif(path + "prediction_channel_0.gif", row, col,
                                 save=False)
    else:
        zero_u_2 = _norm(np.zeros(1), min_u_2, max_u_2)
        data_u_1 = crop_gif(path + "prediction_channel_0.gif", row, col,
                            save=False)
        data_u_2 = crop_gif(path + "prediction_channel_1.gif", row, col,
                            save=False)
        pixels = data_u_2.shape[-1]
        u2_red = _norm(data_u_2[:, :pixels // 2, :pixels // 2].copy(), 0, 255)
        close = np.isclose(u2_red, zero_u_2, atol=atol)
        topology = np.logical_not(np.all(close, axis=0)).astype(float)
        topology = np.concatenate([topology, np.flip(topology, axis=0)],
                                  axis=0)
        data_pred_bin = np.concatenate([topology, np.flip(topology, axis=1)],
                                       axis=1)
        data_pred_bin = np.repeat(data_pred_bin[None], data_u_2.shape[0],
                                  axis=0)
        data_u_1 = _unnorm(_norm(data_u_1, 0, 255), min_u_1, max_u_1)
        data_u_2 = _unnorm(_norm(data_u_2, 0, 255), min_u_2, max_u_2)
        data_u_1 = np.round(data_u_1 * 96).astype(int)
        data_u_2 = np.round(data_u_2 * 96).astype(int)

    data_min = np.min(fr[:, 1])
    data_max = np.max(fr[:, 2])

    data_pred = crop_gif(path + f"prediction_channel_{s_22_idx}.gif", row,
                         col, save=False)

    save_path = path + f"visualization_{row}-{col}/"
    os.makedirs(save_path, exist_ok=True)

    strain = 0.2
    strain_list = np.linspace(0.0, strain, num=len(data_pred))
    strain_list[0] = 0.01 * strain

    data_pred = _unnorm(_norm(data_pred, 0.0, 255.0), data_min, data_max)

    if ref_frame == "eulerian":
        data_pred[data_pred_bin < 255 / 2] = 0
    else:
        data_pred[data_pred_bin == 0] = 0
        bin_euler = update_pixel_positions(data_u_1, data_u_2, data_pred_bin,
                                           data_pred_bin)
        pred_euler = update_pixel_positions(data_u_1, data_u_2, data_pred,
                                            data_pred_bin)
        pred_euler[bin_euler == 0] = 0

    # pixel-estimated stress-strain curve (src/utils.py:396-410)
    curve = np.zeros(len(data_pred))
    for i in range(len(data_pred)):
        if ref_frame == "eulerian":
            top_row = int(np.floor((1.0 - strain_list[i])
                                   * data_pred.shape[-1]))
            curve[i] = -np.mean(data_pred[i, -top_row:, :])
        else:
            curve[i] = -np.mean(data_pred[i]) / (1.0 - strain_list[i])
    shift = curve[0] - ((curve[1] - curve[0])
                        / (strain_list[1] - strain_list[0])) * strain_list[0]
    curve_shifted = curve - shift
    np.savetxt(save_path + "stress_strain_estimate.csv",
               np.stack([strain_list, curve_shifted], axis=1), delimiter=",",
               header="strain,pred_pixel_shifted", comments="")

    # symmetric colormap range
    data_max = max(abs(data_min), abs(data_max))
    data_min = -data_max
    data_pred = np.round(_unnorm(_norm(data_pred, data_min, data_max),
                                 0.0, 255.0)).astype(np.uint8)
    if ref_frame == "lagrangian":
        pred_euler = np.round(_unnorm(_norm(pred_euler, data_min, data_max),
                                      0.0, 255.0)).astype(np.uint8)

    if ref_frame == "eulerian":
        data_pred[data_pred_bin < 255 / 2] = 0
    else:
        data_pred[data_pred_bin == 0] = 0

    cmap = plt.get_cmap("jet")
    color = (cmap(data_pred) * 255).astype(np.uint8)
    color[data_pred_bin == 0, 3] = 0

    gray = np.array([227, 227, 227, 255], np.uint8)
    if ref_frame == "eulerian" and disp_compression:
        for f in range(len(color)):
            box_end = round(strain_list[f] * color[f].shape[0])
            color[f, :box_end, :, :] = gray

    imageio.v3.imwrite(save_path + "visualization.gif", list(color),
                       plugin="pillow", mode="RGBA", duration=200, loop=0,
                       disposal=2, quantize=256)

    if ref_frame == "lagrangian":
        pred_euler[bin_euler == 0] = 0
        for f in range(len(pred_euler)):
            pred_euler[f] = remove_artifacts(pred_euler[f],
                                             check_isolated_pixels=True)
        color_e = (cmap(pred_euler) * 255).astype(np.uint8)
        color_e[bin_euler == 0, 3] = 0
        if disp_compression:
            for f in range(len(color_e)):
                box_end = round(strain_list[f] * color_e[f].shape[0])
                color_e[f, :box_end, :, :] = gray
        euler_path = save_path + "visualization_conv_euler.gif"
        imageio.v3.imwrite(euler_path, list(color_e), plugin="pillow",
                           mode="RGBA", duration=200, loop=0, disposal=2,
                           quantize=256)
        convert_isolated_pixels_gif(euler_path)

    # colorbar legend
    fig, ax = plt.subplots(figsize=(1, 30))
    fig.subplots_adjust(bottom=0.5)
    norm = plt.Normalize(data_min, data_max)
    cb = plt.colorbar(plt.cm.ScalarMappable(norm=norm, cmap=cmap), cax=ax,
                      orientation="vertical")
    cb.set_label(r"$\sigma_{22}$", rotation=0, labelpad=15, fontsize=30)
    cb.ax.tick_params(labelsize=20)
    fig.savefig(save_path + "visualization_legend.png", bbox_inches="tight")
    plt.close(fig)
    return save_path

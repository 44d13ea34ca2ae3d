

def test_make_contour_overlay():
    import numpy as np

    from megapose6d_tpu.visualization.plotter import make_contour_overlay

    rgb = np.full((40, 50, 3), 30, np.uint8)
    mask = np.zeros((40, 50), bool)
    mask[10:30, 15:35] = True
    out = make_contour_overlay(rgb, mask, thickness=1)
    green = (out == np.asarray([0, 255, 0])).all(-1)
    assert green.any()
    # Contour hugs the mask boundary: interior and far background clean.
    assert not green[20, 25] and not green[2, 2]

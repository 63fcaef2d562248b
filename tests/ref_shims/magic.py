"""Test-only shim of python-magic's ``from_file`` — the reference sniffs
crop widths with it (deepfakes_dataset.py:114, regex ``(\\d+) x (\\d+)``).
Returns a libmagic-style description string from the image header alone."""


def from_file(path):
    from mintime_tpu.data.crop_store import image_dims_header

    dims = image_dims_header(path)
    if dims is None:
        raise ValueError(f"cannot determine image type of {path}")
    return (
        f"PNG image data, {dims[0]} x {dims[1]}, 8-bit/color RGB, "
        "non-interlaced"
    )

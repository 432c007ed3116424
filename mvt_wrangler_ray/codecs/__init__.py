"""Pure-stdlib image codecs (no PIL/cv2 in this environment).

png: a real, spec-compliant PNG encoder/decoder for the 8-bit grayscale
non-interlaced profile — zlib + the five scanline filters. Output is
readable by any PNG tool; decode handles any encoder's filter choices
within the profile.
"""

from .png import decode_png, encode_png  # noqa: F401

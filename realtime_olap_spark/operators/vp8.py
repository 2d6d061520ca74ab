"""Clean-room VP8 decoder — RFC 6386, key frames AND inter frames.

Key frames (the lossy still-image payload of WebP files, ``VP8 ``
chunk): boolean arithmetic decoder (RFC 6386 §7), key-frame header
with segmentation / loop-filter / quantizer / token-probability
updates (§9), per-macroblock intra mode parsing over the key-frame
mode trees (§11), residual token decoding with coefficient bands,
running contexts and DCT value categories (§13), dequantization
(§14.1), the integer inverse DCT/WHT pair (§14.3-14.5), all intra
predictors (16x16, chroma 8x8, and the ten 4x4 B-modes, §12), and the
normal and simple in-loop deblocking filters (§15).

Inter frames (WebM video): last/golden/altref reference buffers with
the §9.7 refresh/copy/sign-bias semantics, inter-frame mode trees and
the candidate-MV survey (§16), motion-vector entropy decoding with
persistent updatable probabilities (§17), SPLITMV sub-block
partitions, and six-tap/bilinear quarter-pel (eighth-pel chroma)
motion compensation (§14.2) — see ``_make_vp8_sequence_decoder``.

The key-frame normative tables (default/update coefficient
probabilities, key-frame B-mode probabilities, quantizer lookups) are
the published RFC 6386 §13.5 / §11.4 / §14.1 values; this copy was
extracted from the container's system ``libwebp.so.7`` rodata and
cross-checked structurally (bijectivity, monotonicity, known anchor
rows) rather than retyped by hand. ``tests/test_webp_lossy.py`` holds
the behavioral evidence: plane-level bit-exactness against that same
library's independent decoder across sizes, qualities and content.
The inter-frame tables (mode contexts, sub-MV reference and MV
probabilities, sub-pixel filter taps) cannot come from that binary —
libwebp's decoder is intra-only and the container ships no libvpx —
so they are written from the RFC's published reference decoder and
pinned by the spec-assembled forward/inverse suite in
``tests/test_vp8_inter.py`` (see the evidence-stance note there and
in COVERAGE.md).

House rules match the sibling codecs (``operators/multimodal.py``):
factory + nested closures (module constants are plain tuples, safe to
pickle by value), the three-valued per-row contract, a
decompression-bomb guard before any pixel allocation, and nothing
raising per-row.

Reference parity: the reference engine stores BYTES columns opaque
with no codecs at all (SURVEY.md §1.3, reference
`core/data/readers/` handles only its own storage formats); this is
part of the training-data multimodal surface the build adds as a
first-class extension.

Pure-Python entropy decoding is the documented correctness baseline
(same stance as the JPEG codec): fine for thumbnails, icons and
goldens; not a libvpx replacement for megapixel corpora.
"""

from __future__ import annotations

#: DC quantizer lookup (RFC 6386 §14.1).
_DC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14,
    15, 16, 17, 17, 18, 19, 20, 20, 21, 21, 22, 22,
    23, 23, 24, 25, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54,
    55, 56, 57, 58, 59, 60, 61, 62, 63, 64, 65, 66,
    67, 68, 69, 70, 71, 72, 73, 74, 75, 76, 76, 77,
    78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110,
    112, 114, 116, 118, 122, 124, 126, 128, 130, 132, 134, 136,
    138, 140, 143, 145, 148, 151, 154, 157,
)

#: AC quantizer lookup (§14.1).
_AC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27,
    28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39,
    40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68,
    70, 72, 74, 76, 78, 80, 82, 84, 86, 88, 90, 92,
    94, 96, 98, 100, 102, 104, 106, 108, 110, 112, 114, 116,
    119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193,
    197, 201, 205, 209, 213, 217, 221, 225, 229, 234, 239, 245,
    249, 254, 259, 264, 269, 274, 279, 284,
)

#: Default token probabilities, flattened
#: [block_type(4)][band(8)][context(3)][node(11)] (§13.5).
_COEFF_PROBS = (
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 253, 136, 254,
    255, 228, 219, 128, 128, 128, 128, 128, 189, 129, 242, 255,
    227, 213, 255, 219, 128, 128, 128, 106, 126, 227, 252, 214,
    209, 255, 255, 128, 128, 128, 1, 98, 248, 255, 236, 226,
    255, 255, 128, 128, 128, 181, 133, 238, 254, 221, 234, 255,
    154, 128, 128, 128, 78, 134, 202, 247, 198, 180, 255, 219,
    128, 128, 128, 1, 185, 249, 255, 243, 255, 128, 128, 128,
    128, 128, 184, 150, 247, 255, 236, 224, 128, 128, 128, 128,
    128, 77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128,
    1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128, 170,
    139, 241, 252, 236, 209, 255, 255, 128, 128, 128, 37, 116,
    196, 243, 228, 255, 255, 255, 128, 128, 128, 1, 204, 254,
    255, 245, 255, 128, 128, 128, 128, 128, 207, 160, 250, 255,
    238, 128, 128, 128, 128, 128, 128, 102, 103, 231, 255, 211,
    171, 128, 128, 128, 128, 128, 1, 152, 252, 255, 240, 255,
    128, 128, 128, 128, 128, 177, 135, 243, 255, 234, 225, 128,
    128, 128, 128, 128, 80, 129, 211, 255, 194, 224, 128, 128,
    128, 128, 128, 1, 1, 255, 128, 128, 128, 128, 128, 128,
    128, 128, 246, 1, 255, 128, 128, 128, 128, 128, 128, 128,
    128, 255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62, 131,
    45, 198, 221, 172, 176, 220, 157, 252, 221, 1, 68, 47,
    146, 208, 149, 167, 221, 162, 255, 223, 128, 1, 149, 241,
    255, 221, 224, 255, 255, 128, 128, 128, 184, 141, 234, 253,
    222, 220, 255, 199, 128, 128, 128, 81, 99, 181, 242, 176,
    190, 249, 202, 255, 255, 128, 1, 129, 232, 253, 214, 197,
    242, 196, 255, 255, 128, 99, 121, 210, 250, 201, 198, 255,
    202, 128, 128, 128, 23, 91, 163, 242, 170, 187, 247, 210,
    255, 255, 128, 1, 200, 246, 255, 234, 255, 128, 128, 128,
    128, 128, 109, 178, 241, 255, 231, 245, 255, 255, 128, 128,
    128, 44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128,
    1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128, 94,
    136, 225, 251, 218, 190, 255, 255, 128, 128, 128, 22, 100,
    174, 245, 186, 161, 255, 199, 128, 128, 128, 1, 182, 249,
    255, 232, 235, 128, 128, 128, 128, 128, 124, 143, 241, 255,
    227, 234, 128, 128, 128, 128, 128, 35, 77, 181, 251, 193,
    211, 255, 205, 128, 128, 128, 1, 157, 247, 255, 236, 231,
    255, 255, 128, 128, 128, 121, 141, 235, 255, 225, 227, 255,
    255, 128, 128, 128, 45, 99, 188, 251, 195, 217, 255, 224,
    128, 128, 128, 1, 1, 251, 255, 213, 255, 128, 128, 128,
    128, 128, 203, 1, 248, 255, 255, 128, 128, 128, 128, 128,
    128, 137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128,
    253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128, 175,
    13, 224, 243, 193, 185, 249, 198, 255, 255, 128, 73, 17,
    171, 221, 161, 179, 236, 167, 255, 234, 128, 1, 95, 247,
    253, 212, 183, 255, 255, 128, 128, 128, 239, 90, 244, 250,
    211, 209, 255, 255, 128, 128, 128, 155, 77, 195, 248, 188,
    195, 255, 255, 128, 128, 128, 1, 24, 239, 251, 218, 219,
    255, 205, 128, 128, 128, 201, 51, 219, 255, 196, 186, 128,
    128, 128, 128, 128, 69, 46, 190, 239, 201, 218, 255, 228,
    128, 128, 128, 1, 191, 251, 255, 255, 128, 128, 128, 128,
    128, 128, 223, 165, 249, 255, 213, 255, 128, 128, 128, 128,
    128, 141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128,
    1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128, 190,
    36, 230, 255, 236, 255, 128, 128, 128, 128, 128, 149, 1,
    255, 128, 128, 128, 128, 128, 128, 128, 128, 1, 226, 255,
    128, 128, 128, 128, 128, 128, 128, 128, 247, 192, 255, 128,
    128, 128, 128, 128, 128, 128, 128, 240, 128, 255, 128, 128,
    128, 128, 128, 128, 128, 128, 1, 134, 252, 255, 255, 128,
    128, 128, 128, 128, 128, 213, 62, 250, 255, 255, 128, 128,
    128, 128, 128, 128, 55, 93, 255, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255, 126,
    38, 182, 232, 169, 184, 228, 174, 255, 187, 128, 61, 46,
    138, 219, 151, 178, 240, 170, 255, 216, 128, 1, 112, 230,
    250, 199, 191, 247, 159, 255, 255, 128, 166, 109, 228, 252,
    211, 215, 255, 174, 128, 128, 128, 39, 77, 162, 232, 172,
    180, 245, 178, 255, 255, 128, 1, 52, 220, 246, 198, 199,
    249, 220, 255, 255, 128, 124, 74, 191, 243, 183, 193, 250,
    221, 255, 255, 128, 24, 71, 130, 219, 154, 170, 243, 182,
    255, 255, 128, 1, 182, 225, 249, 219, 240, 255, 224, 128,
    128, 128, 149, 150, 226, 252, 216, 205, 255, 171, 128, 128,
    128, 28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128,
    1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128, 123,
    102, 209, 247, 188, 196, 255, 233, 128, 128, 128, 20, 95,
    153, 243, 164, 173, 255, 203, 128, 128, 128, 1, 222, 248,
    255, 216, 213, 128, 128, 128, 128, 128, 168, 175, 246, 252,
    235, 205, 255, 255, 128, 128, 128, 47, 116, 215, 255, 211,
    212, 255, 255, 128, 128, 128, 1, 121, 236, 253, 212, 214,
    255, 255, 128, 128, 128, 141, 84, 213, 252, 201, 202, 255,
    219, 128, 128, 128, 42, 80, 160, 240, 162, 185, 255, 205,
    128, 128, 128, 1, 1, 255, 128, 128, 128, 128, 128, 128,
    128, 128, 244, 1, 255, 128, 128, 128, 128, 128, 128, 128,
    128, 238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
)

#: Probabilities that each token probability is updated in the
#: frame header, same layout (§13.4).
_COEFF_UPDATE_PROBS = (
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 176, 246, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 223, 241, 252, 255,
    255, 255, 255, 255, 255, 255, 255, 249, 253, 253, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 244, 252, 255, 255, 255,
    255, 255, 255, 255, 255, 234, 254, 254, 255, 255, 255, 255,
    255, 255, 255, 255, 253, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 246, 254, 255, 255, 255, 255, 255, 255,
    255, 255, 239, 253, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255, 251,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 253, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 251, 254, 254, 255,
    255, 255, 255, 255, 255, 255, 255, 254, 255, 254, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 254, 253, 255, 254, 255,
    255, 255, 255, 255, 255, 250, 255, 254, 255, 254, 255, 255,
    255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    217, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 225,
    252, 241, 253, 255, 255, 254, 255, 255, 255, 255, 234, 250,
    241, 250, 253, 255, 253, 254, 255, 255, 255, 255, 254, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 223, 254, 254, 255,
    255, 255, 255, 255, 255, 255, 255, 238, 253, 254, 254, 255,
    255, 255, 255, 255, 255, 255, 255, 248, 254, 255, 255, 255,
    255, 255, 255, 255, 255, 249, 254, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 253, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 247, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255, 252,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 253, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 254, 253, 255, 255, 255,
    255, 255, 255, 255, 255, 250, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    186, 251, 250, 255, 255, 255, 255, 255, 255, 255, 255, 234,
    251, 244, 254, 255, 255, 255, 255, 255, 255, 255, 251, 251,
    243, 253, 254, 255, 254, 255, 255, 255, 255, 255, 253, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 236, 253, 254, 255,
    255, 255, 255, 255, 255, 255, 255, 251, 253, 253, 254, 254,
    255, 255, 255, 255, 255, 255, 255, 254, 254, 255, 255, 255,
    255, 255, 255, 255, 255, 254, 254, 254, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    248, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 250,
    254, 252, 254, 255, 255, 255, 255, 255, 255, 255, 248, 254,
    249, 253, 255, 255, 255, 255, 255, 255, 255, 255, 253, 253,
    255, 255, 255, 255, 255, 255, 255, 255, 246, 253, 253, 255,
    255, 255, 255, 255, 255, 255, 255, 252, 254, 251, 254, 254,
    255, 255, 255, 255, 255, 255, 255, 254, 252, 255, 255, 255,
    255, 255, 255, 255, 255, 248, 254, 253, 255, 255, 255, 255,
    255, 255, 255, 255, 253, 255, 254, 254, 255, 255, 255, 255,
    255, 255, 255, 255, 251, 254, 255, 255, 255, 255, 255, 255,
    255, 255, 245, 251, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 251, 253, 255, 255, 255, 255, 255, 255, 255, 255, 252,
    253, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 252, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 249, 255, 254, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 253, 255, 255, 255,
    255, 255, 255, 255, 255, 250, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
)

#: Key-frame 4x4 B-mode probabilities,
#: [above_mode(10)][left_mode(10)][node(9)] flattened, in the RFC
#: 6386 §11.4 mode order (DC,TM,VE,HE,LD,RD,VR,VL,HD,HU). The
#: system-library copy stores modes in libwebp's internal order
#: (RD,VR ahead of LD); rows/columns were permuted back to the
#: spec order when extracting.
_KF_BMODE_PROBS = (
    231, 120, 48, 89, 115, 113, 120, 152, 112,
    152, 179, 64, 126, 170, 118, 46, 70, 95,
    175, 69, 143, 80, 85, 82, 72, 155, 103,
    56, 58, 10, 171, 218, 189, 17, 13, 152,
    144, 71, 10, 38, 171, 213, 144, 34, 26,
    114, 26, 17, 163, 44, 195, 21, 10, 173,
    121, 24, 80, 195, 26, 62, 44, 64, 85,
    170, 46, 55, 19, 136, 160, 33, 206, 71,
    63, 20, 8, 114, 114, 208, 12, 9, 226,
    81, 40, 11, 96, 182, 84, 29, 16, 36,
    134, 183, 89, 137, 98, 101, 106, 165, 148,
    72, 187, 100, 130, 157, 111, 32, 75, 80,
    66, 102, 167, 99, 74, 62, 40, 234, 128,
    41, 53, 9, 178, 241, 141, 26, 8, 107,
    104, 79, 12, 27, 217, 255, 87, 17, 7,
    74, 43, 26, 146, 73, 166, 49, 23, 157,
    65, 38, 105, 160, 51, 52, 31, 115, 128,
    87, 68, 71, 44, 114, 51, 15, 186, 23,
    47, 41, 14, 110, 182, 183, 21, 17, 194,
    66, 45, 25, 102, 197, 189, 23, 18, 22,
    88, 88, 147, 150, 42, 46, 45, 196, 205,
    43, 97, 183, 117, 85, 38, 35, 179, 61,
    39, 53, 200, 87, 26, 21, 43, 232, 171,
    56, 34, 51, 104, 114, 102, 29, 93, 77,
    107, 54, 32, 26, 51, 1, 81, 43, 31,
    39, 28, 85, 171, 58, 165, 90, 98, 64,
    34, 22, 116, 206, 23, 34, 43, 166, 73,
    68, 25, 106, 22, 64, 171, 36, 225, 114,
    34, 19, 21, 102, 132, 188, 16, 76, 124,
    62, 18, 78, 95, 85, 57, 50, 48, 51,
    193, 101, 35, 159, 215, 111, 89, 46, 111,
    60, 148, 31, 172, 219, 228, 21, 18, 111,
    112, 113, 77, 85, 179, 255, 38, 120, 114,
    40, 42, 1, 196, 245, 209, 10, 25, 109,
    100, 80, 8, 43, 154, 1, 51, 26, 71,
    88, 43, 29, 140, 166, 213, 37, 43, 154,
    61, 63, 30, 155, 67, 45, 68, 1, 209,
    142, 78, 78, 16, 255, 128, 34, 197, 171,
    41, 40, 5, 102, 211, 183, 4, 1, 221,
    51, 50, 17, 168, 209, 192, 23, 25, 82,
    125, 98, 42, 88, 104, 85, 117, 175, 82,
    95, 84, 53, 89, 128, 100, 113, 101, 45,
    75, 79, 123, 47, 51, 128, 81, 171, 1,
    57, 17, 5, 71, 102, 57, 53, 41, 49,
    115, 21, 2, 10, 102, 255, 166, 23, 6,
    38, 33, 13, 121, 57, 73, 26, 1, 85,
    41, 10, 67, 138, 77, 110, 90, 47, 114,
    101, 29, 16, 10, 85, 128, 101, 196, 26,
    57, 18, 10, 102, 102, 213, 34, 20, 43,
    117, 20, 15, 36, 163, 128, 68, 1, 26,
    138, 31, 36, 171, 27, 166, 38, 44, 229,
    67, 87, 58, 169, 82, 115, 26, 59, 179,
    63, 59, 90, 180, 59, 166, 93, 73, 154,
    40, 40, 21, 116, 143, 209, 34, 39, 175,
    57, 46, 22, 24, 128, 1, 54, 17, 37,
    47, 15, 16, 183, 34, 223, 49, 45, 183,
    46, 17, 33, 183, 6, 98, 15, 32, 183,
    65, 32, 73, 115, 28, 128, 23, 128, 205,
    40, 3, 9, 115, 51, 192, 18, 6, 223,
    87, 37, 9, 115, 59, 77, 64, 21, 47,
    104, 55, 44, 218, 9, 54, 53, 130, 226,
    64, 90, 70, 205, 40, 41, 23, 26, 57,
    54, 57, 112, 184, 5, 41, 38, 166, 213,
    30, 34, 26, 133, 152, 116, 10, 32, 134,
    75, 32, 12, 51, 192, 255, 160, 43, 51,
    39, 19, 53, 221, 26, 114, 32, 73, 255,
    31, 9, 65, 234, 2, 15, 1, 118, 73,
    88, 31, 35, 67, 102, 85, 55, 186, 85,
    56, 21, 23, 111, 59, 205, 45, 37, 192,
    55, 38, 70, 124, 73, 102, 1, 34, 98,
    102, 61, 71, 37, 34, 53, 31, 243, 192,
    69, 60, 71, 38, 73, 119, 28, 222, 37,
    68, 45, 128, 34, 1, 47, 11, 245, 171,
    62, 17, 19, 70, 146, 85, 55, 62, 70,
    75, 15, 9, 9, 64, 255, 184, 119, 16,
    37, 43, 37, 154, 100, 163, 85, 160, 1,
    63, 9, 92, 136, 28, 64, 32, 201, 85,
    86, 6, 28, 5, 64, 255, 25, 248, 1,
    56, 8, 17, 132, 137, 255, 55, 116, 128,
    58, 15, 20, 82, 135, 57, 26, 121, 40,
    164, 50, 31, 137, 154, 133, 25, 35, 218,
    51, 103, 44, 131, 131, 123, 31, 6, 158,
    86, 40, 64, 135, 148, 224, 45, 183, 128,
    22, 26, 17, 131, 240, 154, 14, 1, 209,
    83, 12, 13, 54, 192, 255, 68, 47, 28,
    45, 16, 21, 91, 64, 222, 7, 1, 197,
    56, 21, 39, 155, 60, 138, 23, 102, 213,
    85, 26, 85, 85, 128, 128, 32, 146, 171,
    18, 11, 7, 63, 144, 171, 4, 4, 246,
    35, 27, 10, 146, 174, 171, 12, 26, 128,
    190, 80, 35, 99, 180, 80, 126, 54, 45,
    85, 126, 47, 87, 176, 51, 41, 20, 32,
    101, 75, 128, 139, 118, 146, 116, 128, 85,
    56, 41, 15, 176, 236, 85, 37, 9, 62,
    146, 36, 19, 30, 171, 255, 97, 27, 20,
    71, 30, 17, 119, 118, 255, 17, 18, 138,
    101, 38, 60, 138, 55, 70, 43, 26, 142,
    138, 45, 61, 62, 219, 1, 81, 188, 64,
    32, 41, 20, 117, 151, 142, 20, 21, 163,
    112, 19, 12, 61, 195, 128, 48, 4, 24,
)

#: Key-frame Y-mode tree + probs (RFC 6386 §11.2); leaves DC=0, V=1,
#: H=2, TM=3, B_PRED=4. An entry <= 0 is the leaf -entry (internal
#: node references are always >= 2, so leaf 0 is unambiguous).
_KF_YMODE_TREE = (-4, 2, 4, 6, 0, -1, -2, -3)
_KF_YMODE_PROBS = (145, 156, 163, 128)

#: Chroma-mode tree + key-frame probs (§11.2).
_UV_MODE_TREE = (0, 2, -1, 4, -2, -3)
_UV_MODE_PROBS = (142, 114, 183)

#: 4x4 B-mode tree (§11.2): DC,TM,VE,HE,LD,RD,VR,VL,HD,HU = 0..9.
_BMODE_TREE = (0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6, -4, 14,
               -7, 16, -8, -9)

#: Segment-id tree (§9.3 / §10).
_SEG_TREE = (2, 4, 0, -1, -2, -3)

#: Coefficient position -> probability band (§13.3).
_COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

#: Zig-zag position -> raster index (§8.1).
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

#: DCT value category extra-bit probabilities and bases (§13.2).
_CAT_PROBS = ((159,), (165, 145), (173, 148, 140), (176, 155, 140, 135),
              (180, 157, 141, 134, 130),
              (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
_CAT_BASES = (5, 7, 11, 19, 35, 67)

#: Y-mode -> implied B-mode for the intra-mode contexts of later
#: B_PRED macroblocks (§11.3): DC->B_DC, V->B_VE, H->B_HE, TM->B_TM.
_YMODE_TO_BMODE = (0, 2, 3, 1)

# ---------------------------------------------------------------------------
# Inter-frame normative tables (RFC 6386 §14.2 / §16 / §17). Written from
# the RFC's published reference decoder; the container ships no
# independent VP8 inter codec to extract/differential against (libvpx is
# absent and libwebp decodes still key frames only — verified in
# COVERAGE.md), so tests/test_vp8_inter.py pins behavior through
# spec-assembled streams and exact motion-compensation equalities.
# ---------------------------------------------------------------------------

#: Non-key-frame intra Y-mode tree (§11.2): DC=0, V=1, H=2, TM=3,
#: B_PRED=4 — note the different shape vs the key-frame tree.
_IF_YMODE_TREE = (0, 2, 4, 6, -1, -2, -3, -4)
#: Default (persistent, updatable) inter-frame mode probabilities.
_IF_YMODE_PROBS = (112, 86, 140, 37)
_IF_UV_PROBS = (162, 101, 204)
#: Context-free default B-mode probabilities for inter-frame B_PRED
#: subblocks (§11.4 — inter frames do not use the above/left context).
_IF_BMODE_PROBS = (120, 90, 79, 133, 87, 85, 80, 111, 151)

#: MB-level inter mode tree (§16.2): ZEROMV=0, NEARESTMV=1, NEARMV=2,
#: NEWMV=3, SPLITMV=4.
_MV_REF_TREE = (0, 2, -1, 4, -2, 6, -3, -4)
#: Probabilities for the mv_ref tree, indexed by the candidate-count
#: context (§16.3). The RFC's table famously contains 257 and 336 —
#: but the reference decoder assigns them into uint8 ``Prob`` arrays,
#: so the normative on-the-wire probabilities are the truncated
#: 257&255=1 and 336&255=80 (also keeps the §7 arithmetic's range
#: invariant intact); stored pre-masked here.
_MODE_CONTEXTS = (
    (7, 1, 1, 143),
    (14, 18, 14, 107),
    (135, 64, 57, 68),
    (60, 56, 128, 65),
    (234, 160, 1, 1),
    (257 & 255, 336 & 255, 1, 1),
)

#: Sub-MV reference tree (§16.2): LEFT4X4=0, ABOVE4X4=1, ZERO4X4=2,
#: NEW4X4=3, with probabilities by left/above-MV context.
_SUB_MV_REF_TREE = (0, 2, -1, 4, -2, -3)
_SUB_MV_REF_PROBS = (
    (147, 136, 18),   # normal
    (106, 145, 1),    # left is zero
    (179, 121, 1),    # above is zero
    (223, 1, 34),     # left == above
    (208, 1, 1),      # left == above == zero
)

#: MB split-partitioning tree (§16.2): leaves are the partitioning
#: index (0 = 2 horizontal halves, 1 = 2 vertical halves,
#: 2 = 4 quarters, 3 = 16 blocks).
_MBSPLIT_TREE = (-3, 2, -2, 4, 0, -1)
_MBSPLIT_PROBS = (110, 111, 150)
#: Subblock -> partition label per split type.
_MBSPLITS = (
    (0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1),
    (0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1),
    (0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3),
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
)
_MBSPLIT_COUNT = (2, 2, 4, 16)
#: First subblock index of each partition per split type.
_MBSPLIT_OFFSET = ((0, 8), (0, 2), (0, 2, 8, 10),
                   (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
                    14, 15))

#: Short-MV magnitude tree (§17.1, values 0..7).
_SMALL_MV_TREE = (2, 8, 4, 6, 0, -1, -2, -3, 10, 12, -4, -5, -6, -7)
#: Default MV component probabilities, 19 per component (row, col):
#: [is_short, sign, short tree x7, long bits x10] (§17.2).
_MV_DEFAULT_PROBS = (
    (162, 128, 225, 146, 172, 147, 214, 39, 156,
     128, 129, 132, 75, 145, 178, 206, 239, 254, 254),
    (164, 128, 204, 170, 119, 235, 140, 230, 228,
     128, 130, 130, 74, 148, 180, 203, 236, 254, 254),
)
#: Probabilities that each MV probability is updated per frame (§17.2).
_MV_UPDATE_PROBS = (
    (237, 246, 253, 253, 254, 254, 254, 254, 254,
     254, 254, 254, 254, 254, 250, 250, 252, 254, 254),
    (231, 243, 245, 253, 254, 254, 254, 254, 254,
     254, 254, 254, 254, 254, 251, 251, 254, 254, 254),
)

#: Six-tap sub-pixel interpolation filters (§14.2), indexed by the
#: 1/8-pel fraction; taps sum to 128, applied with (sum + 64) >> 7 and
#: [0,255] clamping on BOTH passes (the reference decoder's exact
#: intermediate behavior).
_SUBPEL_FILTERS = (
    (0, 0, 128, 0, 0, 0),
    (0, -6, 123, 12, -1, 0),
    (2, -11, 108, 36, -8, 1),
    (0, -9, 93, 50, -6, 0),
    (3, -16, 77, 77, -16, 3),
    (0, -6, 50, 93, -9, 0),
    (1, -8, 36, 108, -11, 2),
    (0, -1, 12, 123, -6, 0),
)
#: Bilinear filters (versions 1-3).
_BILINEAR_FILTERS = ((128, 0), (112, 16), (96, 32), (80, 48),
                     (64, 64), (48, 80), (32, 96), (16, 112))


def _make_vp8_sequence_decoder(max_pixels: int):
    """Build the stateful RFC 6386 VP8 decoder for frame SEQUENCES
    (WebM video): key frames through the intra machinery, inter
    frames through last/golden/altref reference buffers, mode/MV
    prediction (§16), motion-vector entropy decoding (§17), and
    six-tap/bilinear sub-pixel motion compensation (§14.2 — both
    passes rounded ``(sum+64)>>7`` and clamped to [0,255], the
    reference decoder's exact intermediate behavior), with
    persistent entropy / segmentation-feature / loop-filter-delta
    state and the §9.7 refresh, copy and ``refresh_entropy_probs``
    buffer semantics across frames.

    ``decode_frame(data) -> (w, h, y, u, v, shown) | None |
    "unsupported: …"`` — ``shown`` is the frame-tag show_frame bit
    (an altref-update frame decodes and refreshes reference state
    but is not displayed). ``decode_frame.reset()`` clears all
    sequence state; the still-image wrapper below calls it per
    payload. Nothing raises per-row.

    Evidence stance: the container ships no independent VP8 inter
    codec (libvpx absent; libwebp decodes still key frames only), so
    the inter tables are written from the RFC's published reference
    decoder and pinned by the spec-assembled forward/inverse suite
    in tests/test_vp8_inter.py (zero-MV identity, full-pel shifts vs
    an independent numpy expectation, sub-pel filters vs an
    independently written test-side filter, split MVs, buffer
    management, entropy persistence); key-frame output remains
    bit-exact against libwebp across the existing differential
    suites."""
    import struct

    import numpy as np

    # capture module tables by value (house closure rule)
    kf_bmode = _KF_BMODE_PROBS
    coeff_default = _COEFF_PROBS
    update_probs = _COEFF_UPDATE_PROBS
    dcq_tab = _DC_QLOOKUP
    acq_tab = _AC_QLOOKUP
    bands = _COEFF_BANDS
    zigzag = _ZIGZAG
    cat_probs = _CAT_PROBS
    cat_bases = _CAT_BASES
    ymode_tree = _KF_YMODE_TREE
    ymode_probs = _KF_YMODE_PROBS
    uv_tree = _UV_MODE_TREE
    uv_probs = _UV_MODE_PROBS
    bmode_tree = _BMODE_TREE
    seg_tree_shape = _SEG_TREE
    y2b = _YMODE_TO_BMODE
    if_ymode_tree = _IF_YMODE_TREE
    if_ymode_default = _IF_YMODE_PROBS
    if_uv_default = _IF_UV_PROBS
    if_bmode_probs = _IF_BMODE_PROBS
    mv_ref_tree = _MV_REF_TREE
    mode_contexts = _MODE_CONTEXTS
    sub_mv_ref_tree = _SUB_MV_REF_TREE
    sub_mv_ref_probs = _SUB_MV_REF_PROBS
    mbsplit_tree = _MBSPLIT_TREE
    mbsplit_probs = _MBSPLIT_PROBS
    mbsplits = _MBSPLITS
    mbsplit_count = _MBSPLIT_COUNT
    mbsplit_offset = _MBSPLIT_OFFSET
    small_mv_tree = _SMALL_MV_TREE
    mv_default_probs = _MV_DEFAULT_PROBS
    mv_update_probs = _MV_UPDATE_PROBS
    subpel_filters = _SUBPEL_FILTERS
    bilinear_filters = _BILINEAR_FILTERS
    BORDER = 32  # reference-plane replication border (libvpx's 32)

    class _Bad(Exception):
        """Internal malformed-bitstream signal; never escapes."""

    class _Bool:
        """RFC 6386 §7 boolean decoder. A few virtual zero bits past
        the partition end are legal; more than 8 virtual bytes marks
        the stream malformed (bounds corrupt-input loops)."""

        __slots__ = ("buf", "pos", "end", "value", "range", "bits",
                     "virtual")

        def __init__(self, buf, start, end):
            self.buf = buf
            self.end = end
            v = (buf[start] << 8) if start < end else 0
            v |= buf[start + 1] if start + 1 < end else 0
            self.pos = min(start + 2, end)
            self.value = v
            self.range = 255
            self.bits = 0
            self.virtual = 2 - min(2, end - start)

        def get(self, prob):
            # hot inner loop of the whole codec: one local load/store
            # per member, renormalization on locals (measured ~15% off
            # the token-decode wall vs the straight self.* version)
            r = self.range
            split = 1 + (((r - 1) * prob) >> 8)
            v = self.value
            big = split << 8
            if v >= big:
                ret = 1
                r -= split
                v -= big
            else:
                ret = 0
                r = split
            if r < 128:
                bits = self.bits
                pos = self.pos
                end = self.end
                buf = self.buf
                while r < 128:
                    v <<= 1
                    r <<= 1
                    bits += 1
                    if bits == 8:
                        bits = 0
                        if pos < end:
                            v |= buf[pos]
                            pos += 1
                        else:
                            self.virtual += 1
                            if self.virtual > 8:
                                raise _Bad
                self.bits = bits
                self.pos = pos
            self.value = v
            self.range = r
            return ret

        def literal(self, n):
            v = 0
            for _ in range(n):
                v = (v << 1) | self.get(128)
            return v

        def signed(self, n):
            v = self.literal(n)
            return -v if self.get(128) else v

        def flagged_signed(self, n):
            return self.signed(n) if self.get(128) else 0

    def tree_read(bd, tree, probs, start=0):
        i = start
        while True:
            i = tree[i + bd.get(probs[i >> 1])]
            if i <= 0:
                return -i

    # ---- inverse transforms (§14.3-14.5), integer-exact -------------
    def idct4x4(b):
        t = [0] * 16
        for i in range(4):
            x0, x4, x8, x12 = b[i], b[i + 4], b[i + 8], b[i + 12]
            a1 = x0 + x8
            b1 = x0 - x8
            c1 = ((x4 * 35468) >> 16) - (x12 + ((x12 * 20091) >> 16))
            d1 = (x4 + ((x4 * 20091) >> 16)) + ((x12 * 35468) >> 16)
            t[i] = a1 + d1
            t[i + 12] = a1 - d1
            t[i + 4] = b1 + c1
            t[i + 8] = b1 - c1
        out = [0] * 16
        for i in range(4):
            r = i * 4
            x0, x1, x2, x3 = t[r], t[r + 1], t[r + 2], t[r + 3]
            a1 = x0 + x2
            b1 = x0 - x2
            c1 = ((x1 * 35468) >> 16) - (x3 + ((x3 * 20091) >> 16))
            d1 = (x1 + ((x1 * 20091) >> 16)) + ((x3 * 35468) >> 16)
            out[r] = (a1 + d1 + 4) >> 3
            out[r + 3] = (a1 - d1 + 4) >> 3
            out[r + 1] = (b1 + c1 + 4) >> 3
            out[r + 2] = (b1 - c1 + 4) >> 3
        return out

    def iwht4x4(b):
        t = [0] * 16
        for i in range(4):
            a1 = b[i] + b[i + 12]
            b1 = b[i + 4] + b[i + 8]
            c1 = b[i + 4] - b[i + 8]
            d1 = b[i] - b[i + 12]
            t[i] = a1 + b1
            t[i + 4] = c1 + d1
            t[i + 8] = a1 - b1
            t[i + 12] = d1 - c1
        out = [0] * 16
        for i in range(4):
            r = i * 4
            a1 = t[r] + t[r + 3]
            b1 = t[r + 1] + t[r + 2]
            c1 = t[r + 1] - t[r + 2]
            d1 = t[r] - t[r + 3]
            out[r] = (a1 + b1 + 3) >> 3
            out[r + 1] = (c1 + d1 + 3) >> 3
            out[r + 2] = (a1 - b1 + 3) >> 3
            out[r + 3] = (d1 - c1 + 3) >> 3
        return out

    # ---- residual token decoding (§13) -------------------------------
    def decode_coeffs(bd, tprobs, ctx, first, qdc, qac, coeffs):
        """Tokens for one 4x4 block into ``coeffs`` (raster order,
        dequantized). Returns the position after the last nonzero
        coefficient (== ``first`` for an empty block). The running
        context is 0/1/2 by previous-token magnitude; EOB is skipped
        right after a ZERO token (it cannot follow one)."""
        get = bd.get  # bound once: ~6 calls per token
        n = first
        last = first - 1
        skip_eob = False
        while n < 16:
            p = tprobs[bands[n]][ctx]
            if not skip_eob and not get(p[0]):
                break
            if not get(p[1]):  # ZERO: a later nonzero follows
                n += 1
                ctx = 0
                skip_eob = True
                continue
            skip_eob = False
            if not get(p[2]):
                val = 1
                ctx = 1
            else:
                ctx = 2
                if not get(p[3]):
                    val = 2 if not get(p[4]) else 3 + get(p[5])
                else:
                    if not get(p[6]):
                        cat = get(p[7])
                    elif not get(p[8]):
                        cat = 2 + get(p[9])
                    else:
                        cat = 4 + get(p[10])
                    v = 0
                    for cp in cat_probs[cat]:
                        v = (v << 1) | get(cp)
                    val = cat_bases[cat] + v
            if get(128):
                val = -val
            coeffs[zigzag[n]] = val * (qdc if n == 0 else qac)
            last = n
            n += 1
        return last + 1

    # ---- intra predictors (§12) on padded planes ---------------------
    # (row 0 = 127 above border, col 0 = 129 left border, 4 extra
    # right columns stay 127 = the above-right rule beyond the frame)
    def pred_block(plane, y0, x0, size, mode, has_above, has_left):
        if mode == 0:  # DC
            if has_above and has_left:
                s = int(plane[y0 - 1, x0:x0 + size].sum()) \
                    + int(plane[y0:y0 + size, x0 - 1].sum())
                dc = (s + size) >> (5 if size == 16 else 4)
            elif has_above:
                s = int(plane[y0 - 1, x0:x0 + size].sum())
                dc = (s + (size >> 1)) >> (4 if size == 16 else 3)
            elif has_left:
                s = int(plane[y0:y0 + size, x0 - 1].sum())
                dc = (s + (size >> 1)) >> (4 if size == 16 else 3)
            else:
                dc = 128
            plane[y0:y0 + size, x0:x0 + size] = dc
        elif mode == 1:  # V
            plane[y0:y0 + size, x0:x0 + size] = plane[y0 - 1,
                                                      x0:x0 + size]
        elif mode == 2:  # H
            plane[y0:y0 + size, x0:x0 + size] = \
                plane[y0:y0 + size, x0 - 1][:, None]
        else:  # TM
            a = plane[y0 - 1, x0:x0 + size].astype(np.int32)
            l = plane[y0:y0 + size, x0 - 1].astype(np.int32)
            p = int(plane[y0 - 1, x0 - 1])
            plane[y0:y0 + size, x0:x0 + size] = np.clip(
                l[:, None] + a[None, :] - p, 0, 255).astype(np.uint8)

    def pred_b(plane, y0, x0, mode, ar_row):
        """One 4x4 B-mode prediction. ``ar_row`` is the padded row the
        above-right samples A[4..7] come from: the row above the
        subblock for interior columns, but ALWAYS the row above the
        MACROBLOCK for the rightmost subblock column (the right
        neighbor is not decoded yet — the format's above-right rule,
        pinned bit-exactly against libwebp)."""
        A = [int(v) for v in plane[y0 - 1, x0:x0 + 4]] \
            + [int(v) for v in plane[ar_row, x0 + 4:x0 + 8]]
        L = [int(plane[y0 + i, x0 - 1]) for i in range(4)]
        P = int(plane[y0 - 1, x0 - 1])
        b = [[0] * 4 for _ in range(4)]

        def a3(x, y, z):
            return (x + 2 * y + z + 2) >> 2

        def a2(x, y):
            return (x + y + 1) >> 1

        if mode == 0:  # B_DC
            dc = (sum(A[:4]) + sum(L) + 4) >> 3
            for r in range(4):
                b[r] = [dc] * 4
        elif mode == 1:  # B_TM
            for r in range(4):
                for c in range(4):
                    v = L[r] + A[c] - P
                    b[r][c] = 0 if v < 0 else 255 if v > 255 else v
        elif mode == 2:  # B_VE
            e = [a3(P, A[0], A[1]), a3(A[0], A[1], A[2]),
                 a3(A[1], A[2], A[3]), a3(A[2], A[3], A[4])]
            for r in range(4):
                b[r] = list(e)
        elif mode == 3:  # B_HE
            e = (a3(P, L[0], L[1]), a3(L[0], L[1], L[2]),
                 a3(L[1], L[2], L[3]), a3(L[2], L[3], L[3]))
            for r in range(4):
                b[r] = [e[r]] * 4
        elif mode == 4:  # B_LD
            for r in range(4):
                for c in range(4):
                    d = r + c
                    b[r][c] = (a3(A[d], A[d + 1], A[d + 2]) if d < 6
                               else a3(A[6], A[7], A[7]))
        elif mode == 5:  # B_RD
            e = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
            for r in range(4):
                for c in range(4):
                    i = c - r + 3
                    b[r][c] = a3(e[i], e[i + 1], e[i + 2])
        elif mode == 6:  # B_VR
            b[3][0] = a3(L[2], L[1], L[0])
            b[2][0] = a3(L[1], L[0], P)
            b[3][1] = b[1][0] = a3(L[0], P, A[0])
            b[2][1] = b[0][0] = a2(P, A[0])
            b[3][2] = b[1][1] = a3(P, A[0], A[1])
            b[2][2] = b[0][1] = a2(A[0], A[1])
            b[3][3] = b[1][2] = a3(A[0], A[1], A[2])
            b[2][3] = b[0][2] = a2(A[1], A[2])
            b[1][3] = a3(A[1], A[2], A[3])
            b[0][3] = a2(A[2], A[3])
        elif mode == 7:  # B_VL
            b[0][0] = a2(A[0], A[1])
            b[1][0] = a3(A[0], A[1], A[2])
            b[2][0] = b[0][1] = a2(A[1], A[2])
            b[1][1] = b[3][0] = a3(A[1], A[2], A[3])
            b[2][1] = b[0][2] = a2(A[2], A[3])
            b[3][1] = b[1][2] = a3(A[2], A[3], A[4])
            b[2][2] = b[0][3] = a2(A[3], A[4])
            b[3][2] = b[1][3] = a3(A[3], A[4], A[5])
            b[2][3] = a3(A[4], A[5], A[6])
            b[3][3] = a3(A[5], A[6], A[7])
        elif mode == 8:  # B_HD
            b[3][0] = a2(L[3], L[2])
            b[3][1] = a3(L[3], L[2], L[1])
            b[2][0] = b[3][2] = a2(L[2], L[1])
            b[2][1] = b[3][3] = a3(L[2], L[1], L[0])
            b[1][0] = b[2][2] = a2(L[1], L[0])
            b[1][1] = b[2][3] = a3(L[1], L[0], P)
            b[0][0] = b[1][2] = a2(L[0], P)
            b[0][1] = b[1][3] = a3(L[0], P, A[0])
            b[0][2] = a3(P, A[0], A[1])
            b[0][3] = a3(A[0], A[1], A[2])
        else:  # B_HU
            b[0][0] = a2(L[0], L[1])
            b[0][1] = a3(L[0], L[1], L[2])
            b[0][2] = b[1][0] = a2(L[1], L[2])
            b[0][3] = b[1][1] = a3(L[1], L[2], L[3])
            b[1][2] = b[2][0] = a2(L[2], L[3])
            b[1][3] = b[2][1] = a3(L[2], L[3], L[3])
            b[2][2] = b[2][3] = L[3]
            b[3][0] = b[3][1] = b[3][2] = b[3][3] = L[3]
        for r in range(4):
            prow = plane[y0 + r]
            for c in range(4):
                prow[x0 + c] = b[r][c]

    def add_residual(plane, y0, x0, res):
        # uint8 + int32 promotes (int32, not int16: crafted streams
        # can push iDCT outputs into the millions); in-place
        # np.minimum/np.maximum skip np.clip's dispatch wrapper (same
        # rationale as _c below)
        blk = plane[y0:y0 + 4, x0:x0 + 4] \
            + np.array(res, np.int32).reshape(4, 4)
        np.maximum(blk, 0, out=blk)
        np.minimum(blk, 255, out=blk)
        plane[y0:y0 + 4, x0:x0 + 4] = blk

    def add_dc(plane, y0, x0, dc):
        """DC-only block: the full §14.4 iDCT of a lone DC is the
        constant (dc+4)>>3 in every cell — skip the butterfly."""
        blk = plane[y0:y0 + 4, x0:x0 + 4] + np.int32((dc + 4) >> 3)
        np.maximum(blk, 0, out=blk)
        np.minimum(blk, 255, out=blk)
        plane[y0:y0 + 4, x0:x0 + 4] = blk

    # ---- loop filter (§15), vectorized along edge lanes --------------
    def _c(v):
        # np.minimum/np.maximum directly: np.clip's dispatch wrapper
        # costs ~40% extra on the tiny per-edge arrays this runs on
        return np.maximum(np.minimum(v, 127), -128)

    def normal_filter(seg, edge_limit, interior, hev_t, mb_edge):
        """seg: (8, lanes) int32 of [p3 p2 p1 p0 q0 q1 q2 q3]; filters
        in place per §15.2-15.4 (signed-char domain, C shifts). Op
        count matters: this runs per 4-px edge segment, so the six
        interior-limit tests fuse into one |diff| reduction and the
        signed-domain temporaries are shared between branches."""
        d = np.abs(seg[1:] - seg[:-1])      # consecutive |diffs|
        p1q1 = np.abs(seg[2] - seg[5])
        mask = (d[3] * 2 + (p1q1 >> 1) <= edge_limit)
        d[3] = 0                             # p0-q0 is not interior
        mask &= d.max(axis=0) <= interior
        if not mask.any():
            return
        hev = (d[2] > hev_t) | (d[4] > hev_t)
        sp2, sp1, sp0 = seg[1] - 128, seg[2] - 128, seg[3] - 128
        sq0, sq1, sq2 = seg[4] - 128, seg[5] - 128, seg[6] - 128
        base = 3 * (sq0 - sp0)
        outer = _c(sp1 - sq1)
        # every adjusted pixel sum saturates in the signed-char domain
        # BEFORE the +128 re-bias (RFC 6386 vp8_signed_char_clamp in
        # common_adjust / subblock_filter / mbfilter): an unclamped
        # sp0+f2 of e.g. 130 must store as 255, not wrap to 2 — r15
        # differential catch (gradient content at q5: libwebp 255 vs
        # a wrapped 0; seeds pinned in test_fixes_r15)
        if not mb_edge:
            a = _c(np.where(hev, outer, 0) + base)
            f1 = _c(a + 4) >> 3
            f2 = _c(a + 3) >> 3
            seg[3] = np.where(mask, _c(sp0 + f2), sp0) + 128
            seg[4] = np.where(mask, _c(sq0 - f1), sq0) + 128
            a2_ = (f1 + 1) >> 1
            use = mask & ~hev
            if use.any():
                seg[2] = np.where(use, _c(sp1 + a2_), sp1) + 128
                seg[5] = np.where(use, _c(sq1 - a2_), sq1) + 128
            return
        # MB edge: hev lanes take the short adjust, others the 3-tap
        a = _c(outer + base)  # the RFC's w value; also feeds hev lanes
        f1 = _c(a + 4) >> 3
        f2 = _c(a + 3) >> 3
        a27 = (27 * a + 63) >> 7
        a18 = (18 * a + 63) >> 7
        a9 = (9 * a + 63) >> 7
        sel_h = mask & hev
        sel_w = mask & ~hev
        seg[1] = np.where(sel_w, _c(sp2 + a9), sp2) + 128
        seg[2] = np.where(sel_w, _c(sp1 + a18), sp1) + 128
        seg[3] = np.where(sel_w, _c(sp0 + a27),
                          np.where(sel_h, _c(sp0 + f2), sp0)) + 128
        seg[4] = np.where(sel_w, _c(sq0 - a27),
                          np.where(sel_h, _c(sq0 - f1), sq0)) + 128
        seg[5] = np.where(sel_w, _c(sq1 - a18), sq1) + 128
        seg[6] = np.where(sel_w, _c(sq2 - a9), sq2) + 128

    def simple_seg_filter(seg, edge_limit):
        p1, p0, q0, q1 = (seg[i] for i in range(4))
        mask = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)
                <= edge_limit)
        sp1, sp0, sq0, sq1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
        a = _c(_c(sp1 - sq1) + 3 * (sq0 - sp0))
        f1 = _c(a + 4) >> 3
        f2 = _c(a + 3) >> 3
        seg[1] = np.where(mask, _c(sp0 + f2), sp0) + 128
        seg[2] = np.where(mask, _c(sq0 - f1), sq0) + 128

    # Wave-batched edge filtering (r15). The loop filter was the
    # lossy-decode wall (35% of a 0.3 MP WebP decode, numpy-dispatch-
    # bound at ~25 tiny-array ops per 4/8/16-lane edge call). The RFC
    # §15.1 per-MB raster order induces exactly these dependencies
    # between macroblocks: (r,c) needs (r,c-1) (vertical-edge column
    # chain + its horizontal writes reach 3 px into c's columns),
    # (r-1,c) (horizontal writes reach 3 px below), and (r-1,c+1)
    # (ITS vertical-mb-edge writes reach 3 px left into c's top rows,
    # read by c's top horizontal edge). All three are satisfied by
    # the skewed wavefront w = 2*row + col (the H.264-style 2:1
    # wavefront): every MB in a wave is pairwise disjoint in
    # read/write regions, so same-offset edges of a whole wave batch
    # into ONE normal_filter call with per-lane limits — one fancy-
    # index gather, one filter, one scatter. Bit-identity is pinned
    # by the libwebp differential suite and an old-vs-new randomized
    # decode differential (bit-exact by construction: only the
    # execution order of independent edges changes).
    def batch_v(plane, xs, ys, n, lims, ils, hevs, mb_edge, simple):
        if xs.size == 0:
            return
        wpl = plane.shape[1]
        flat = plane.reshape(-1)
        base = ((ys[:, None] + np.arange(n)[None, :]) * wpl
                + xs[:, None]).reshape(-1)
        off = np.arange(-2, 2) if simple else np.arange(-4, 4)
        idx = base[None, :] + off[:, None]
        seg = flat[idx].astype(np.int32)
        if simple:
            simple_seg_filter(seg, np.repeat(lims, n))
            flat[idx[1:3]] = seg[1:3]
        else:
            normal_filter(seg, np.repeat(lims, n), np.repeat(ils, n),
                          np.repeat(hevs, n), mb_edge)
            # filtered values are in [0,255] by construction (the
            # mask bounds the adjust toward the neighbor; pinned by
            # the bit-exactness suite) - store without extra clamp
            flat[idx[1:7]] = seg[1:7]

    def batch_h(plane, xs, ys, n, lims, ils, hevs, mb_edge, simple):
        if xs.size == 0:
            return
        wpl = plane.shape[1]
        flat = plane.reshape(-1)
        base = (ys[:, None] * wpl + xs[:, None]
                + np.arange(n)[None, :]).reshape(-1)
        off = (np.arange(-2, 2) if simple else np.arange(-4, 4)) * wpl
        idx = base[None, :] + off[:, None]
        seg = flat[idx].astype(np.int32)
        if simple:
            simple_seg_filter(seg, np.repeat(lims, n))
            flat[idx[1:3]] = seg[1:3]
        else:
            normal_filter(seg, np.repeat(lims, n), np.repeat(ils, n),
                          np.repeat(hevs, n), mb_edge)
            flat[idx[1:7]] = seg[1:7]

    # ---- motion compensation (§14.2) ---------------------------------
    # r14 MC pass (the r12 dispatch-count discipline applied to the
    # sub-pel filters, which profile as ~60% of inter-frame decode):
    # zero taps are skipped via precomputed (offset, tap) pairs (six of
    # the eight six-tap rows carry only 2-4 nonzero taps), accumulation
    # is in place (no per-tap temporaries), and the round/shift/clamp
    # runs as direct in-place ufuncs — np.clip's fromnumeric dispatch
    # alone was ~18% of the decode wall. Bit-identical by construction:
    # (acc+64)>>7 is the same arithmetic-shift op, zero taps contribute
    # zero, and the clamp bounds are unchanged (re-proven by the
    # fullpel/subpel/bilinear property sweeps and the libwebp
    # differential suite).
    subpel_nz = tuple(tuple((k, t) for k, t in enumerate(row) if t)
                      for row in subpel_filters)

    def filt6_h(a, nz, wout):
        k0, t0 = nz[0]
        acc = t0 * a[:, k0:k0 + wout]
        for k, t in nz[1:]:
            acc += t * a[:, k:k + wout]
        acc += 64
        acc >>= 7
        np.maximum(acc, 0, out=acc)
        np.minimum(acc, 255, out=acc)
        return acc

    def filt6_v(a, nz, hout):
        k0, t0 = nz[0]
        acc = t0 * a[k0:k0 + hout, :]
        for k, t in nz[1:]:
            acc += t * a[k:k + hout, :]
        acc += 64
        acc >>= 7
        np.maximum(acc, 0, out=acc)
        np.minimum(acc, 255, out=acc)
        return acc

    def filt2_h(a, taps, wout):
        acc = taps[0] * a[:, 0:wout]
        acc += taps[1] * a[:, 1:wout + 1]
        acc += 64
        acc >>= 7
        return acc

    def filt2_v(a, taps, hout):
        acc = taps[0] * a[0:hout, :]
        acc += taps[1] * a[1:hout + 1, :]
        acc += 64
        acc >>= 7
        return acc

    def mc_block(ref, py, px, bh, bw, mvr, mvc, bilinear):
        """Prediction block from a border-padded reference plane
        (frame origin at [BORDER, BORDER]); mv in 1/8-pel plane
        units. Fraction==0 passes collapse to single-pass/copy —
        bit-identical to the reference decoder's always-two-pass with
        the identity tap row, since (128*x + 64) >> 7 == x."""
        r0 = BORDER + py + (mvr >> 3)
        c0 = BORDER + px + (mvc >> 3)
        yf = mvr & 7
        xf = mvc & 7
        if not (xf or yf):
            return ref[r0:r0 + bh, c0:c0 + bw]
        if bilinear:
            if xf and yf:
                a = ref[r0:r0 + bh + 1, c0:c0 + bw + 1].astype(np.int32)
                return filt2_v(filt2_h(a, bilinear_filters[xf], bw),
                               bilinear_filters[yf], bh).astype(np.uint8)
            if xf:
                a = ref[r0:r0 + bh, c0:c0 + bw + 1].astype(np.int32)
                return filt2_h(a, bilinear_filters[xf],
                               bw).astype(np.uint8)
            a = ref[r0:r0 + bh + 1, c0:c0 + bw].astype(np.int32)
            return filt2_v(a, bilinear_filters[yf], bh).astype(np.uint8)
        if xf and yf:
            a = ref[r0 - 2:r0 + bh + 3,
                    c0 - 2:c0 + bw + 3].astype(np.int32)
            return filt6_v(filt6_h(a, subpel_nz[xf], bw),
                           subpel_nz[yf], bh).astype(np.uint8)
        if xf:
            a = ref[r0:r0 + bh, c0 - 2:c0 + bw + 3].astype(np.int32)
            return filt6_h(a, subpel_nz[xf], bw).astype(np.uint8)
        a = ref[r0 - 2:r0 + bh + 3, c0:c0 + bw].astype(np.int32)
        return filt6_v(a, subpel_nz[yf], bh).astype(np.uint8)

    # ---- motion-vector entropy decoding (§17.1) ----------------------
    def read_mvcomponent(bd, p):
        if bd.get(p[0]):  # long vector: bits 0-2, then 9 down to 4,
            x = 0         # then bit 3 (implicit 1 when no upper bits)
            for i in range(3):
                x += bd.get(p[9 + i]) << i
            for i in range(9, 3, -1):
                x += bd.get(p[9 + i]) << i
            if not (x & 0xFFF0) or bd.get(p[12]):
                x += 8
        else:
            x = tree_read(bd, small_mv_tree, p[2:9])
        if x and bd.get(p[1]):
            return -x
        return x

    # ---- persistent sequence state -----------------------------------
    st: dict = {}

    def default_coef():
        return [[[list(coeff_default[(((t * 8 + b) * 3 + c) * 11):
                                     (((t * 8 + b) * 3 + c) * 11) + 11])
                  for c in range(3)] for b in range(8)]
                for t in range(4)]

    def reset_entropy():
        st["coef"] = default_coef()
        st["ymode_p"] = list(if_ymode_default)
        st["uv_p"] = list(if_uv_default)
        st["mv_p"] = [list(mv_default_probs[0]),
                      list(mv_default_probs[1])]

    def reset():
        st.clear()
        st.update(w=None, h=None, mb_w=0, mb_h=0, refs=None,
                  sign_bias=[0, 0, 0, 0], seg_quant=[0] * 4,
                  seg_lf=[0] * 4, seg_abs=0, seg_map=None,
                  ref_lf=[0] * 4, mode_lf=[0] * 4)
        reset_entropy()

    reset()

    # ------------------------------------------------------------------
    def decode_frame(data):
        if not isinstance(data, (bytes, bytearray)):
            return None
        data = bytes(data)
        try:
            if len(data) < 3:
                return None
            tag = data[0] | (data[1] << 8) | (data[2] << 16)
            keyframe = not (tag & 1)
            version = (tag >> 1) & 7
            shown = (tag >> 4) & 1
            part1_len = tag >> 5
            if version > 3:
                return f"unsupported: VP8 version {version}"
            # versions 1-3: bilinear reconstruction filter; version 3
            # additionally masks chroma MVs to full-pel. The loop
            # filter stays driven by the frame header alone — libwebp
            # (the decoder the key-frame suite is pinned against)
            # filters purely from the header bits.
            bilinear = version >= 1
            fullpel_mask = ~7 if version == 3 else ~0
            if keyframe:
                if len(data) < 10 or data[3:6] != b"\x9d\x01\x2a":
                    return None
                w = (data[6] | (data[7] << 8)) & 0x3FFF
                h = (data[8] | (data[9] << 8)) & 0x3FFF
                if w == 0 or h == 0:
                    return None
                if w * h > max_pixels:
                    return f"unsupported: image too large ({w}x{h})"
                if part1_len == 0 or 10 + part1_len > len(data):
                    return None
                hdr_end = 10
                # key frame: reset sequence state (the reference
                # decoder's init_frame — entropy tables, segment
                # feature data, LF deltas and sign biases all revert)
                if (w, h) != (st["w"], st["h"]):
                    st["seg_map"] = None
                st["w"], st["h"] = w, h
                mb_w = (w + 15) >> 4
                mb_h = (h + 15) >> 4
                st["mb_w"], st["mb_h"] = mb_w, mb_h
                reset_entropy()
                st["seg_quant"] = [0] * 4
                st["seg_lf"] = [0] * 4
                st["seg_abs"] = 0
                st["ref_lf"] = [0] * 4
                st["mode_lf"] = [0] * 4
                st["sign_bias"] = [0, 0, 0, 0]
                if st["seg_map"] is None:
                    st["seg_map"] = [[0] * mb_w for _ in range(mb_h)]
            else:
                if st["w"] is None or not st["refs"]:
                    return ("unsupported: VP8 inter frame without "
                            "reference frames")
                w, h = st["w"], st["h"]
                mb_w, mb_h = st["mb_w"], st["mb_h"]
                if part1_len == 0 or 3 + part1_len > len(data):
                    return None
                hdr_end = 3
            bd = _Bool(data, hdr_end, hdr_end + part1_len)
            sign_bias = st["sign_bias"]
            refs = st["refs"]

            if keyframe:
                bd.get(128)  # color space
                bd.get(128)  # clamping type (output is clamped anyway)

            # segmentation (§9.3) — feature data and map persist
            seg_enabled = bd.get(128)
            update_map = 0
            seg_quant = st["seg_quant"]
            seg_lf = st["seg_lf"]
            seg_probs = [255, 255, 255]
            if seg_enabled:
                update_map = bd.get(128)
                if bd.get(128):  # update feature data
                    st["seg_abs"] = bd.get(128)
                    for i in range(4):
                        seg_quant[i] = bd.flagged_signed(7)
                    for i in range(4):
                        seg_lf[i] = bd.flagged_signed(6)
                if update_map:
                    for i in range(3):
                        seg_probs[i] = (bd.literal(8) if bd.get(128)
                                        else 255)
            seg_abs = st["seg_abs"]
            seg_map = st["seg_map"]

            # loop filter header (§9.4) — deltas persist; when delta
            # coding is disabled this frame the stored values are NOT
            # applied (shadowed with zeros) but survive for later
            use_simple_lf = bd.get(128)
            filter_level = bd.literal(6)
            sharpness = bd.literal(3)
            ref_lf_delta = st["ref_lf"]
            mode_lf_delta = st["mode_lf"]
            if bd.get(128):  # lf deltas enabled
                if bd.get(128):  # updated this frame
                    for i in range(4):
                        if bd.get(128):
                            ref_lf_delta[i] = bd.signed(6)
                    for i in range(4):
                        if bd.get(128):
                            mode_lf_delta[i] = bd.signed(6)
            else:
                ref_lf_delta = [0, 0, 0, 0]
                mode_lf_delta = [0, 0, 0, 0]

            # token partitions (§9.5)
            n_parts = 1 << bd.literal(2)
            part_start = hdr_end + part1_len
            sizes_end = part_start + 3 * (n_parts - 1)
            if sizes_end > len(data):
                return None
            parts = []
            off = sizes_end
            for i in range(n_parts - 1):
                base = part_start + 3 * i
                sz = (data[base] | (data[base + 1] << 8)
                      | (data[base + 2] << 16))
                if off + sz > len(data):
                    return None
                parts.append(_Bool(data, off, off + sz))
                off += sz
            parts.append(_Bool(data, off, len(data)))

            # quantizers (§9.6 / §14.1)
            y_ac_qi = bd.literal(7)
            y_dc_d = bd.flagged_signed(4)
            y2_dc_d = bd.flagged_signed(4)
            y2_ac_d = bd.flagged_signed(4)
            uv_dc_d = bd.flagged_signed(4)
            uv_ac_d = bd.flagged_signed(4)

            def clip_q(v, hi=127):
                return 0 if v < 0 else hi if v > hi else v

            seg_q = []
            for s in range(4):
                qi = (seg_quant[s] if seg_abs
                      else y_ac_qi + seg_quant[s]) if seg_enabled \
                    else y_ac_qi
                qi = clip_q(qi)
                y2ac = (acq_tab[clip_q(qi + y2_ac_d)] * 155) // 100
                seg_q.append((
                    dcq_tab[clip_q(qi + y_dc_d)],
                    acq_tab[qi],
                    dcq_tab[clip_q(qi + y2_dc_d)] * 2,
                    y2ac if y2ac >= 8 else 8,
                    dcq_tab[clip_q(qi + uv_dc_d, 117)],
                    acq_tab[clip_q(qi + uv_ac_d)],
                ))

            # refresh & copy flags (§9.7)
            if keyframe:
                refresh_golden = refresh_alt = refresh_last = 1
                copy_to_gf = copy_to_arf = 0
            else:
                refresh_golden = bd.get(128)
                refresh_alt = bd.get(128)
                copy_to_gf = 0 if refresh_golden else bd.literal(2)
                copy_to_arf = 0 if refresh_alt else bd.literal(2)
                sign_bias[2] = bd.get(128)
                sign_bias[3] = bd.get(128)
            refresh_entropy = bd.get(128)
            if not keyframe:
                refresh_last = bd.get(128)
            if not refresh_entropy:
                # this frame's probability updates apply to this frame
                # only; the pre-update state is restored afterwards
                saved_entropy = (
                    [[[list(r) for r in b] for b in t]
                     for t in st["coef"]],
                    list(st["ymode_p"]), list(st["uv_p"]),
                    [list(st["mv_p"][0]), list(st["mv_p"][1])])

            # token probability updates (§13.4) into persistent state
            probs = st["coef"]
            for t in range(4):
                for b in range(8):
                    for c in range(3):
                        base = ((t * 8 + b) * 3 + c) * 11
                        row = probs[t][b][c]
                        for l in range(11):
                            if bd.get(update_probs[base + l]):
                                row[l] = bd.literal(8)

            mb_no_skip = bd.get(128)
            prob_skip = bd.literal(8) if mb_no_skip else 0

            if not keyframe:
                prob_intra = bd.literal(8)
                prob_last = bd.literal(8)
                prob_gf = bd.literal(8)
                if bd.get(128):
                    for i in range(4):
                        st["ymode_p"][i] = bd.literal(8)
                if bd.get(128):
                    for i in range(3):
                        st["uv_p"][i] = bd.literal(8)
                for comp in range(2):  # §17.2 MV probability updates
                    up = mv_update_probs[comp]
                    pr = st["mv_p"][comp]
                    for i in range(19):
                        if bd.get(up[i]):
                            x = bd.literal(7)
                            pr[i] = (x << 1) if x else 1
            if_ymode_p = st["ymode_p"]
            if_uv_p = st["uv_p"]
            mv_probs = st["mv_p"]

            # frame buffers, padded (see predictor comment above)
            Y = np.empty((1 + 16 * mb_h, 1 + 16 * mb_w + 4), np.uint8)
            U = np.empty((1 + 8 * mb_h, 1 + 8 * mb_w + 4), np.uint8)
            V = np.empty((1 + 8 * mb_h, 1 + 8 * mb_w + 4), np.uint8)
            for P in (Y, U, V):
                P[0, :] = 127
                P[1:, 0] = 129
                P[1:, -4:] = 127
            # r14 MC pass: ZEROMV-from-LAST fast path. Most inter MBs
            # predict (0,0) from the LAST reference; one bulk interior
            # copy per plane lets those MBs skip their three mc_block
            # slice-assigns entirely — bit-identical (the bytes are
            # already in place) and kinder to memory bandwidth at
            # occupancy than hundreds of 16x16 strided writes.
            last_precopied = False
            if not keyframe and refs.get(1) is not None:
                ly, lu, lv = refs[1]
                Y[1:, 1:1 + 16 * mb_w] = ly[BORDER:BORDER + 16 * mb_h,
                                            BORDER:BORDER + 16 * mb_w]
                U[1:, 1:1 + 8 * mb_w] = lu[BORDER:BORDER + 8 * mb_h,
                                           BORDER:BORDER + 8 * mb_w]
                V[1:, 1:1 + 8 * mb_w] = lv[BORDER:BORDER + 8 * mb_h,
                                           BORDER:BORDER + 8 * mb_w]
                last_precopied = True

            mb_lvl = [[0] * mb_w for _ in range(mb_h)]
            mb_inner = [[0] * mb_w for _ in range(mb_h)]

            above_bm = [[0] * 4 for _ in range(mb_w)]
            above_nz = [[0] * 9 for _ in range(mb_w)]

            # neighbor mode/MV info for §16.3 prediction contexts:
            # (ref, (row, col), is_split); off-frame rows/cols are
            # intra with zero MV (the reference decoder's zeroed
            # border mode_info)
            intra_info = (0, (0, 0), False)
            above_info = [intra_info] * mb_w
            above_smv = [[(0, 0)] * 4 for _ in range(mb_w)]

            for my in range(mb_h):
                left_bm = [0, 0, 0, 0]
                left_nz = [0] * 9
                left_info = intra_info
                left_smv = [(0, 0)] * 4
                al = intra_info
                tb = parts[my % n_parts]
                y0 = 1 + 16 * my
                cy0 = 1 + 8 * my
                for mx in range(mb_w):
                    x0 = 1 + 16 * mx
                    cx0 = 1 + 8 * mx
                    anz = above_nz[mx]

                    # ---- macroblock header (first partition, §11/§16)
                    if seg_enabled:
                        if update_map:
                            seg_id = tree_read(bd, seg_tree_shape,
                                               seg_probs)
                            seg_map[my][mx] = seg_id
                        else:
                            seg_id = seg_map[my][mx]
                    else:
                        seg_id = 0
                    skip = bd.get(prob_skip) if mb_no_skip else 0
                    is_inter = (not keyframe) and bd.get(prob_intra)
                    ym = None
                    imode = None
                    is_split = False
                    submvs = None
                    mb_ref = 0
                    mb_mv = (0, 0)
                    need_clamp = 0
                    bmodes = None
                    if not is_inter:
                        if keyframe:
                            ym = tree_read(bd, ymode_tree, ymode_probs)
                        else:
                            ym = tree_read(bd, if_ymode_tree,
                                           if_ymode_p)
                        if ym == 4:  # B_PRED: 16 coded subblock modes
                            bmodes = [0] * 16
                            if keyframe:
                                abm = above_bm[mx]
                                for sb in range(16):
                                    r, c = sb >> 2, sb & 3
                                    am = abm[c] if r == 0 \
                                        else bmodes[sb - 4]
                                    lm = (left_bm[r] if c == 0
                                          else bmodes[sb - 1])
                                    pr = kf_bmode[(am * 10 + lm) * 9:
                                                  (am * 10 + lm) * 9
                                                  + 9]
                                    bmodes[sb] = tree_read(
                                        bd, bmode_tree, pr)
                            else:
                                # inter-frame B modes are context-free
                                for sb in range(16):
                                    bmodes[sb] = tree_read(
                                        bd, bmode_tree, if_bmode_probs)
                            above_bm[mx] = bmodes[12:16]
                            left_bm = [bmodes[3], bmodes[7],
                                       bmodes[11], bmodes[15]]
                        else:
                            m = y2b[ym]
                            above_bm[mx] = [m, m, m, m]
                            left_bm = [m, m, m, m]
                        uvm = tree_read(bd, uv_tree,
                                        uv_probs if keyframe
                                        else if_uv_p)
                    else:
                        # ---- inter MB: reference + mode + MVs (§16)
                        above_bm[mx] = [0, 0, 0, 0]
                        left_bm = [0, 0, 0, 0]
                        if bd.get(prob_last):
                            mb_ref = 2 + bd.get(prob_gf)
                        else:
                            mb_ref = 1

                        # find_near_mvs (§16.3): survey above / left /
                        # above-left, sign-bias-corrected, exactly the
                        # reference decoder's pointer walk
                        a_ref, a_mv, a_split = above_info[mx]
                        l_ref, l_mv, l_split = left_info
                        al_ref, al_mv, al_split = al
                        cand = [(0, 0), (0, 0), (0, 0), (0, 0)]
                        cnt = [0, 0, 0, 0]
                        mvi = 0
                        cur_bias = sign_bias[mb_ref]
                        if a_ref:
                            if a_mv != (0, 0):
                                mvi = 1
                                cand[1] = ((-a_mv[0], -a_mv[1])
                                           if sign_bias[a_ref]
                                           != cur_bias else a_mv)
                            cnt[mvi] += 2
                        if l_ref:
                            if l_mv != (0, 0):
                                bm = ((-l_mv[0], -l_mv[1])
                                      if sign_bias[l_ref] != cur_bias
                                      else l_mv)
                                if bm != cand[mvi]:
                                    mvi += 1
                                    cand[mvi] = bm
                                cnt[mvi] += 2
                            else:
                                cnt[0] += 2
                        if al_ref:
                            if al_mv != (0, 0):
                                bm = ((-al_mv[0], -al_mv[1])
                                      if sign_bias[al_ref] != cur_bias
                                      else al_mv)
                                if bm != cand[mvi]:
                                    mvi += 1
                                    cand[mvi] = bm
                                cnt[mvi] += 1
                            else:
                                cnt[0] += 1
                        if mvi == 3 and cand[3] == cand[1]:
                            cnt[1] += 1
                        cnt[3] = 2 * (a_split + l_split) + al_split
                        if cnt[2] > cnt[1]:
                            cnt[1], cnt[2] = cnt[2], cnt[1]
                            cand[1], cand[2] = cand[2], cand[1]
                        if cnt[1] >= cnt[0]:
                            cand[0] = cand[1]

                        lo_c = -(mx << 7) - 128
                        hi_c = ((mb_w - 1 - mx) << 7) + 128
                        lo_r = -(my << 7) - 128
                        hi_r = ((mb_h - 1 - my) << 7) + 128

                        def clamp2(mv):
                            r_, c_ = mv
                            return (lo_r if r_ < lo_r else
                                    hi_r if r_ > hi_r else r_,
                                    lo_c if c_ < lo_c else
                                    hi_c if c_ > hi_c else c_)

                        def in_bounds(mv):
                            return (lo_r <= mv[0] <= hi_r
                                    and lo_c <= mv[1] <= hi_c)

                        best_mv = clamp2(cand[0])
                        nearest_mv = clamp2(cand[1])
                        near_mv = clamp2(cand[2])
                        p_ref = (mode_contexts[cnt[0]][0],
                                 mode_contexts[cnt[1]][1],
                                 mode_contexts[cnt[2]][2],
                                 mode_contexts[cnt[3]][3])
                        imode = tree_read(bd, mv_ref_tree, p_ref)
                        if imode == 0:  # ZEROMV
                            mb_mv = (0, 0)
                        elif imode == 1:  # NEARESTMV
                            mb_mv = nearest_mv
                        elif imode == 2:  # NEARMV
                            mb_mv = near_mv
                        elif imode == 3:  # NEWMV (row then col, 1/8
                            # pel: components are coded in quarter
                            # pel and doubled)
                            dr = read_mvcomponent(bd, mv_probs[0]) * 2
                            dc = read_mvcomponent(bd, mv_probs[1]) * 2
                            mb_mv = (best_mv[0] + dr, best_mv[1] + dc)
                            need_clamp = not in_bounds(mb_mv)
                        else:  # SPLITMV (§16.2)
                            is_split = True
                            s = tree_read(bd, mbsplit_tree,
                                          mbsplit_probs)
                            smap = mbsplits[s]
                            submvs = [None] * 16
                            for j in range(mbsplit_count[s]):
                                k = mbsplit_offset[s][j]
                                if k & 3:
                                    lmv = submvs[k - 1]
                                elif l_split:
                                    lmv = left_smv[k >> 2]
                                else:
                                    lmv = l_mv
                                if k >> 2:
                                    amv = submvs[k - 4]
                                elif a_split:
                                    amv = above_smv[mx][k & 3]
                                else:
                                    amv = a_mv
                                lez = lmv == (0, 0)
                                aez = amv == (0, 0)
                                lea = lmv == amv
                                ctx4 = (4 if lea and lez else
                                        3 if lea else
                                        2 if aez else
                                        1 if lez else 0)
                                sm = tree_read(bd, sub_mv_ref_tree,
                                               sub_mv_ref_probs[ctx4])
                                if sm == 0:  # LEFT4X4
                                    bmv = lmv
                                elif sm == 1:  # ABOVE4X4
                                    bmv = amv
                                elif sm == 2:  # ZERO4X4
                                    bmv = (0, 0)
                                else:  # NEW4X4
                                    dr = read_mvcomponent(
                                        bd, mv_probs[0]) * 2
                                    dc = read_mvcomponent(
                                        bd, mv_probs[1]) * 2
                                    bmv = (best_mv[0] + dr,
                                           best_mv[1] + dc)
                                if not in_bounds(bmv):
                                    need_clamp = 1
                                for sb in range(16):
                                    if smap[sb] == j:
                                        submvs[sb] = bmv
                            mb_mv = submvs[15]

                    # ---- residuals (token partition, §13)
                    q = seg_q[seg_id]
                    has_y2 = (ym != 4) if not is_inter else not is_split
                    coeffs_y = None
                    coeffs_u = coeffs_v = None
                    ynz = [0] * 16
                    yeob = [0] * 16
                    unz = [0] * 4
                    ueob = [0] * 4
                    vnz = [0] * 4
                    veob = [0] * 4
                    nnz_any = 0
                    if skip:
                        for i in range(8):
                            anz[i] = 0
                            left_nz[i] = 0
                        if has_y2:
                            anz[8] = 0
                            left_nz[8] = 0
                    else:
                        coeffs_y = [[0] * 16 for _ in range(16)]
                        coeffs_u = [[0] * 16 for _ in range(4)]
                        coeffs_v = [[0] * 16 for _ in range(4)]
                        if has_y2:
                            y2 = [0] * 16
                            ctx = anz[8] + left_nz[8]
                            eob = decode_coeffs(tb, probs[1], ctx, 0,
                                                q[2], q[3], y2)
                            nz = 1 if eob > 0 else 0
                            anz[8] = left_nz[8] = nz
                            nnz_any |= nz
                            wht = iwht4x4(y2) if nz else None
                            ytype, first = 0, 1
                        else:
                            wht = None
                            ytype, first = 3, 0
                        tp = probs[ytype]
                        for r in range(4):
                            l = left_nz[r]
                            for c in range(4):
                                sb = r * 4 + c
                                cf = coeffs_y[sb]
                                eob = decode_coeffs(tb, tp,
                                                    anz[c] + l, first,
                                                    q[0], q[1], cf)
                                nz = 1 if eob > first else 0
                                anz[c] = l = nz
                                nnz_any |= nz
                                if wht is not None:
                                    cf[0] = wht[sb]
                                yeob[sb] = eob
                                ynz[sb] = nz or (wht is not None
                                                 and wht[sb] != 0)
                            left_nz[r] = l
                        tp = probs[2]
                        for coeffs_c, cnz, ceob, base in (
                                (coeffs_u, unz, ueob, 4),
                                (coeffs_v, vnz, veob, 6)):
                            for r in range(2):
                                l = left_nz[base + r]
                                for c in range(2):
                                    cf = coeffs_c[r * 2 + c]
                                    eob = decode_coeffs(
                                        tb, tp, anz[base + c] + l, 0,
                                        q[4], q[5], cf)
                                    nz = 1 if eob > 0 else 0
                                    anz[base + c] = l = nz
                                    nnz_any |= nz
                                    cnz[r * 2 + c] = nz
                                    ceob[r * 2 + c] = eob
                                left_nz[base + r] = l

                    # ---- reconstruction (§12 intra / §14.2 inter,
                    # then §14.5 residual add)
                    if is_inter:
                        yref, uref, vref = refs[mb_ref]
                        py, px = 16 * my, 16 * mx
                        cpy, cpx = 8 * my, 8 * mx

                        def clamp_umv(r_, c_):
                            # clamp_mv_to_umv_border: beyond the 19/18
                            # px margin snaps to the 16 px margin
                            le = -(mx << 7)
                            re = (mb_w - 1 - mx) << 7
                            te = -(my << 7)
                            be = (mb_h - 1 - my) << 7
                            if c_ < le - 152:
                                c_ = le - 128
                            elif c_ > re + 144:
                                c_ = re + 128
                            if r_ < te - 152:
                                r_ = te - 128
                            elif r_ > be + 144:
                                r_ = be + 128
                            return r_, c_

                        def clamp_uvmv(r_, c_):
                            le = -(mx << 7)
                            re = (mb_w - 1 - mx) << 7
                            te = -(my << 7)
                            be = (mb_h - 1 - my) << 7
                            if 2 * c_ < le - 152:
                                c_ = (le - 128) >> 1
                            if 2 * c_ > re + 144:
                                c_ = (re + 128) >> 1
                            if 2 * r_ < te - 152:
                                r_ = (te - 128) >> 1
                            if 2 * r_ > be + 144:
                                r_ = (be + 128) >> 1
                            return r_, c_

                        def avg8(t):
                            # the reference's +4-with-sign then
                            # truncate-toward-zero /8
                            t2 = t + (4 if t >= 0 else -4)
                            q8 = abs(t2) >> 3
                            return q8 if t2 >= 0 else -q8

                        if not is_split:
                            mvr, mvc = mb_mv
                            if need_clamp:
                                mvr, mvc = clamp_umv(mvr, mvc)
                            if (last_precopied and mb_ref == 1
                                    and mvr == 0 and mvc == 0):
                                # ZEROMV from LAST: the bulk pre-copy
                                # already placed these exact bytes
                                pass
                            else:
                                Y[y0:y0 + 16, x0:x0 + 16] = mc_block(
                                    yref, py, px, 16, 16, mvr, mvc,
                                    bilinear)
                            if not (last_precopied and mb_ref == 1
                                    and mvr == 0 and mvc == 0):
                                # chroma MV: (v + sign) / 2,
                                # truncated, from the CLAMPED luma MV
                                # (zero luma MV -> zero chroma MV, so
                                # the fast path above covers chroma)
                                ur = (abs(mvr) + 1) >> 1
                                if mvr < 0:
                                    ur = -ur
                                uc = (abs(mvc) + 1) >> 1
                                if mvc < 0:
                                    uc = -uc
                                ur &= fullpel_mask
                                uc &= fullpel_mask
                                U[cy0:cy0 + 8, cx0:cx0 + 8] = mc_block(
                                    uref, cpy, cpx, 8, 8, ur, uc,
                                    bilinear)
                                V[cy0:cy0 + 8, cx0:cx0 + 8] = mc_block(
                                    vref, cpy, cpx, 8, 8, ur, uc,
                                    bilinear)
                        else:
                            # r14 MC pass: greedy equal-MV rectangle
                            # merge. Partition types 0/1/2 replicate
                            # one MV across 16x8 / 8x16 / 8x8 regions
                            # (and real type-3 streams reuse LEFT/
                            # ABOVE sub-MVs), so adjacent 4x4s with
                            # the same CLAMPED MV collapse into one
                            # mc_block over the union rectangle —
                            # bit-identical, because the sub-pel
                            # filter of a uniform-MV region is
                            # position-separable (each output pixel
                            # sees the same taps over the same source
                            # window wherever the block boundary
                            # falls). Cuts the dominant per-call
                            # dispatch cost of SPLITMV MBs ~2x.
                            cl = [clamp_umv(*submvs[sb]) if need_clamp
                                  else submvs[sb] for sb in range(16)]
                            done = 0
                            for sb in range(16):
                                if done >> sb & 1:
                                    continue
                                r4, c4 = sb >> 2, sb & 3
                                mv = cl[sb]
                                w4 = 1
                                while (c4 + w4 < 4
                                       and not done >> (sb + w4) & 1
                                       and cl[sb + w4] == mv):
                                    w4 += 1
                                h4 = 1
                                while (r4 + h4 < 4 and all(
                                        not done >> (sb + 4 * h4 + k) & 1
                                        and cl[sb + 4 * h4 + k] == mv
                                        for k in range(w4))):
                                    h4 += 1
                                for dy in range(h4):
                                    for dx in range(w4):
                                        done |= 1 << (sb + 4 * dy + dx)
                                by, bx = 4 * r4, 4 * c4
                                Y[y0 + by:y0 + by + 4 * h4,
                                  x0 + bx:x0 + bx + 4 * w4] = mc_block(
                                    yref, py + by, px + bx,
                                    4 * h4, 4 * w4, mv[0], mv[1],
                                    bilinear)
                            cmv = []
                            for i in range(2):
                                for j in range(2):
                                    b0 = i * 8 + j * 2
                                    tr = (submvs[b0][0]
                                          + submvs[b0 + 1][0]
                                          + submvs[b0 + 4][0]
                                          + submvs[b0 + 5][0])
                                    tc = (submvs[b0][1]
                                          + submvs[b0 + 1][1]
                                          + submvs[b0 + 4][1]
                                          + submvs[b0 + 5][1])
                                    ur = avg8(tr) & fullpel_mask
                                    uc = avg8(tc) & fullpel_mask
                                    if need_clamp:
                                        ur, uc = clamp_uvmv(ur, uc)
                                    cmv.append((ur, uc))
                            done = 0
                            for b in range(4):
                                if done >> b & 1:
                                    continue
                                i, j = b >> 1, b & 1
                                mv = cmv[b]
                                w4 = 2 if (j == 0
                                           and cmv[b + 1] == mv) else 1
                                h4 = 2 if (i == 0 and all(
                                    cmv[b + 2 + k] == mv
                                    for k in range(w4))) else 1
                                for dy in range(h4):
                                    for dx in range(w4):
                                        done |= 1 << (b + 2 * dy + dx)
                                U[cy0 + 4 * i:cy0 + 4 * i + 4 * h4,
                                  cx0 + 4 * j:cx0 + 4 * j + 4 * w4] = \
                                    mc_block(uref, cpy + 4 * i,
                                             cpx + 4 * j, 4 * h4,
                                             4 * w4, mv[0], mv[1],
                                             bilinear)
                                V[cy0 + 4 * i:cy0 + 4 * i + 4 * h4,
                                  cx0 + 4 * j:cx0 + 4 * j + 4 * w4] = \
                                    mc_block(vref, cpy + 4 * i,
                                             cpx + 4 * j, 4 * h4,
                                             4 * w4, mv[0], mv[1],
                                             bilinear)
                        if not skip:
                            for sb in range(16):
                                if ynz[sb]:
                                    by = y0 + 4 * (sb >> 2)
                                    bx = x0 + 4 * (sb & 3)
                                    if yeob[sb] <= 1:
                                        add_dc(Y, by, bx,
                                               coeffs_y[sb][0])
                                    else:
                                        add_residual(
                                            Y, by, bx,
                                            idct4x4(coeffs_y[sb]))
                            for coeffs_c, cnz, ceob, P in (
                                    (coeffs_u, unz, ueob, U),
                                    (coeffs_v, vnz, veob, V)):
                                for sb in range(4):
                                    if cnz[sb]:
                                        by = cy0 + 4 * (sb >> 1)
                                        bx = cx0 + 4 * (sb & 1)
                                        if ceob[sb] <= 1:
                                            add_dc(P, by, bx,
                                                   coeffs_c[sb][0])
                                        else:
                                            add_residual(
                                                P, by, bx,
                                                idct4x4(coeffs_c[sb]))
                    elif has_y2:
                        pred_block(Y, y0, x0, 16, ym, my > 0, mx > 0)
                        if not skip:
                            for sb in range(16):
                                if ynz[sb]:
                                    by = y0 + 4 * (sb >> 2)
                                    bx = x0 + 4 * (sb & 3)
                                    if yeob[sb] <= 1:
                                        add_dc(Y, by, bx,
                                               coeffs_y[sb][0])
                                    else:
                                        add_residual(
                                            Y, by, bx,
                                            idct4x4(coeffs_y[sb]))
                    else:
                        for sb in range(16):
                            by = y0 + 4 * (sb >> 2)
                            bx = x0 + 4 * (sb & 3)
                            ar_row = (y0 - 1) if (sb & 3) == 3 \
                                else by - 1
                            pred_b(Y, by, bx, bmodes[sb], ar_row)
                            if not skip and ynz[sb]:
                                if yeob[sb] <= 1:
                                    add_dc(Y, by, bx, coeffs_y[sb][0])
                                else:
                                    add_residual(Y, by, bx,
                                                 idct4x4(coeffs_y[sb]))
                    if not is_inter:
                        pred_block(U, cy0, cx0, 8, uvm, my > 0, mx > 0)
                        pred_block(V, cy0, cx0, 8, uvm, my > 0, mx > 0)
                        if not skip:
                            for coeffs_c, cnz, ceob, P in (
                                    (coeffs_u, unz, ueob, U),
                                    (coeffs_v, vnz, veob, V)):
                                for sb in range(4):
                                    if cnz[sb]:
                                        by = cy0 + 4 * (sb >> 1)
                                        bx = cx0 + 4 * (sb & 1)
                                        if ceob[sb] <= 1:
                                            add_dc(P, by, bx,
                                                   coeffs_c[sb][0])
                                        else:
                                            add_residual(
                                                P, by, bx,
                                                idct4x4(coeffs_c[sb]))

                    # ---- per-MB loop-filter params (§15.1); ref
                    # delta by reference frame, mode delta: B_PRED=0,
                    # ZEROMV=1, other inter=2, SPLITMV=3 (non-B_PRED
                    # intra modes take no mode delta)
                    lvl = (seg_lf[seg_id] if seg_abs
                           else filter_level + seg_lf[seg_id]) \
                        if seg_enabled else filter_level
                    lvl += ref_lf_delta[mb_ref]
                    if is_inter:
                        if is_split:
                            lvl += mode_lf_delta[3]
                        elif imode == 0:
                            lvl += mode_lf_delta[1]
                        else:
                            lvl += mode_lf_delta[2]
                    elif ym == 4:
                        lvl += mode_lf_delta[0]
                    mb_lvl[my][mx] = 0 if lvl < 0 else \
                        63 if lvl > 63 else lvl
                    mb_inner[my][mx] = 1 if (nnz_any or ym == 4
                                             or is_split) else 0

                    # ---- neighbor info for the next MBs
                    cur_info = (mb_ref, mb_mv, is_split)
                    if is_split:
                        cur_bottom = submvs[12:16]
                        cur_right = [submvs[3], submvs[7],
                                     submvs[11], submvs[15]]
                    else:
                        cur_bottom = cur_right = [mb_mv] * 4
                    al = above_info[mx]
                    above_info[mx] = cur_info
                    above_smv[mx] = cur_bottom
                    left_info = cur_info
                    left_smv = cur_right

                # Rightmost-MB above-right rule: beyond the frame's
                # right edge the 4 "above-right" samples seen by the
                # NEXT macroblock row's B_PRED subblocks are the above
                # row's last real pixel, replicated (row 0 reads the
                # 127 border, which replication also yields there).
                # Pinned bit-exactly against libwebp on right-edge
                # B_PRED content — a constant 127 is NOT what the
                # format does below the first row.
                Y[y0:y0 + 16, 1 + 16 * mb_w:] = \
                    Y[y0:y0 + 16, 16 * mb_w][:, None]

            # ---- loop filter pass (§15). libwebp/libvpx skip the
            # pass entirely when the frame-header filter level is 0,
            # even if segmentation supplies its own LF values — match
            # that (a filter_level==0 + nonzero segment-LF stream
            # must decode identically to the reference decoders).
            if filter_level > 0:
                # per-MB parameter grids, then the 2:1 skewed
                # wavefront (w = 2*row + col): every MB in a wave is
                # read/write-disjoint from the others (see batch_v),
                # so each edge offset batches into ONE filter call
                # per wave with per-lane limits. Per-MB edge ORDER is
                # preserved exactly: all vertical edges left-to-right
                # (mb edge, +4, +8, +12), then horizontal top-to-
                # bottom — the §15.1 sequence.
                lvl = np.asarray(mb_lvl, np.int64)
                il_g = lvl.copy()
                if sharpness:
                    il_g >>= 1 if sharpness <= 4 else 2
                    np.minimum(il_g, 9 - sharpness, out=il_g)
                np.maximum(il_g, 1, out=il_g)
                hev_g = np.where(lvl >= 40, 2,
                                 np.where(lvl >= 15, 1, 0))
                mb_lim_g = (lvl + 2) * 2 + il_g
                sb_lim_g = lvl * 2 + il_g
                inner_g = np.asarray(mb_inner, bool)
                s = use_simple_lf
                for wv in range(2 * (mb_h - 1) + mb_w):
                    rlo = max(0, -((mb_w - 1 - wv) // 2))
                    rs = np.arange(rlo, min(mb_h, wv // 2 + 1))
                    cs = wv - 2 * rs
                    act = lvl[rs, cs] > 0
                    rs, cs = rs[act], cs[act]
                    if rs.size == 0:
                        continue
                    x0 = 1 + 16 * cs
                    y0 = 1 + 16 * rs
                    cx0 = 1 + 8 * cs
                    cy0 = 1 + 8 * rs
                    lim_mb = mb_lim_g[rs, cs]
                    lim_sb = sb_lim_g[rs, cs]
                    il = il_g[rs, cs]
                    hv = hev_g[rs, cs]
                    inner = inner_g[rs, cs]
                    m = cs > 0
                    batch_v(Y, x0[m], y0[m], 16, lim_mb[m], il[m],
                            hv[m], True, s)
                    if not s and m.any():
                        batch_v(U, cx0[m], cy0[m], 8, lim_mb[m],
                                il[m], hv[m], True, False)
                        batch_v(V, cx0[m], cy0[m], 8, lim_mb[m],
                                il[m], hv[m], True, False)
                    for dx in (4, 8, 12):
                        batch_v(Y, x0[inner] + dx, y0[inner], 16,
                                lim_sb[inner], il[inner], hv[inner],
                                False, s)
                    if not s and inner.any():
                        batch_v(U, cx0[inner] + 4, cy0[inner], 8,
                                lim_sb[inner], il[inner], hv[inner],
                                False, False)
                        batch_v(V, cx0[inner] + 4, cy0[inner], 8,
                                lim_sb[inner], il[inner], hv[inner],
                                False, False)
                    m = rs > 0
                    batch_h(Y, x0[m], y0[m], 16, lim_mb[m], il[m],
                            hv[m], True, s)
                    if not s and m.any():
                        batch_h(U, cx0[m], cy0[m], 8, lim_mb[m],
                                il[m], hv[m], True, False)
                        batch_h(V, cx0[m], cy0[m], 8, lim_mb[m],
                                il[m], hv[m], True, False)
                    for dy in (4, 8, 12):
                        batch_h(Y, x0[inner], y0[inner] + dy, 16,
                                lim_sb[inner], il[inner], hv[inner],
                                False, s)
                    if not s and inner.any():
                        batch_h(U, cx0[inner], cy0[inner] + 4, 8,
                                lim_sb[inner], il[inner], hv[inner],
                                False, False)
                        batch_h(V, cx0[inner], cy0[inner] + 4, 8,
                                lim_sb[inner], il[inner], hv[inner],
                                False, False)

            cw, chh = (w + 1) >> 1, (h + 1) >> 1
            out = (w, h,
                   Y[1:1 + h, 1:1 + w].copy(),
                   U[1:1 + chh, 1:1 + cw].copy(),
                   V[1:1 + chh, 1:1 + cw].copy())

            # ---- reference buffer management (§9.7). Copy flags read
            # the OLD buffers, in the reference decoder's order: arf
            # copy (from last/golden), then gf copy (from last/alt —
            # including an alt the arf copy just replaced), then the
            # refresh flags install the newly decoded frame.
            new_ref = (
                np.pad(Y[1:1 + 16 * mb_h, 1:1 + 16 * mb_w], BORDER,
                       mode="edge"),
                np.pad(U[1:1 + 8 * mb_h, 1:1 + 8 * mb_w], BORDER,
                       mode="edge"),
                np.pad(V[1:1 + 8 * mb_h, 1:1 + 8 * mb_w], BORDER,
                       mode="edge"))
            if keyframe:
                st["refs"] = {1: new_ref, 2: new_ref, 3: new_ref}
            else:
                if copy_to_arf:
                    refs[3] = refs[1] if copy_to_arf == 1 else refs[2]
                if copy_to_gf:
                    refs[2] = refs[1] if copy_to_gf == 1 else refs[3]
                if refresh_golden:
                    refs[2] = new_ref
                if refresh_alt:
                    refs[3] = new_ref
                if refresh_last:
                    refs[1] = new_ref
            if not refresh_entropy:
                (st["coef"], st["ymode_p"], st["uv_p"],
                 st["mv_p"]) = saved_entropy
            return out + (shown,)
        except (_Bad, struct.error, IndexError, ValueError):
            return None

    decode_frame.reset = reset
    return decode_frame


def _make_vp8_planes_decoder(max_pixels: int):
    """Still-image (single key frame) wrapper over the sequence
    decoder: ``decode(payload) -> (w, h, y, u, v)`` with uint8
    ndarrays (y: h x w; u, v: ceil(h/2) x ceil(w/2)) — or ``None``
    for malformed bytes / ``"unsupported: …"`` for inter frames
    (still WebP carries key frames only) and over-budget dimensions.
    Nothing raises per-row."""
    seq = _make_vp8_sequence_decoder(max_pixels)

    def decode(data):
        if isinstance(data, (bytes, bytearray)) and len(data) >= 3 \
                and data[0] & 1:
            return "unsupported: WebP inter frame"
        seq.reset()
        res = seq(data)
        if isinstance(res, tuple):
            return res[:5]
        return res

    return decode


def _make_vp8_decoder(max_pixels: int):
    """RGB-producing wrapper over the planes decoder:
    ``decode(payload) -> (w, h, rgb ndarray) | None | reason``.

    The 4:2:0 -> RGB rendering (nearest-neighbor chroma upsample +
    integer BT.601 limited-range conversion) is NOT part of RFC 6386 —
    the codec's output is the YUV planes, which the tests pin
    bit-exactly; libwebp's fancy upsampler will differ by a few counts
    on chroma edges. Documented, not hidden. Nested function, captured
    by value (house rule — no module-level helper references)."""
    import numpy as np

    planes = _make_vp8_planes_decoder(max_pixels)

    def to_rgb(y, u, v):
        h, w = y.shape
        uu = u.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.int32) - 128
        vv = v.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.int32) - 128
        c = y.astype(np.int32) - 16
        r = np.clip((298 * c + 409 * vv + 128) >> 8, 0, 255)
        g = np.clip((298 * c - 100 * uu - 208 * vv + 128) >> 8, 0, 255)
        b = np.clip((298 * c + 516 * uu + 128) >> 8, 0, 255)
        return np.dstack([r, g, b]).astype(np.uint8)

    def decode(data):
        res = planes(data)
        if not isinstance(res, tuple):
            return res
        w, h, y, u, v = res
        return w, h, to_rgb(y, u, v)

    return decode

"""undexqv — uncompress .dexqv back to .quiva (reference undexqv.c)."""

from __future__ import annotations

import sys

from ._common import codec_tool
from ..codecs.qv_codec import decode_dexqv_to_quiva

USAGE = "[-vkU] <path:dexqv> ..."
HELP = (
    "-k: do *not* remove the .dexqv file on completion.",
    "-U: use uppercase letters (default is lower case).",
)


def main(argv=None) -> int:
    return codec_tool(
        "undexqv", USAGE, HELP, ".dexqv", ".quiva",
        lambda data, flags, opts: decode_dexqv_to_quiva(
            data, upper=flags["U"], device=None),
        flags_str="vkU",
        argv=argv, pipe_ok=False)


if __name__ == "__main__":
    sys.exit(main())

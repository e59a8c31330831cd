#!/usr/bin/env bash
# Assemble a numbered image sequence into an H.264 MP4 (CPU-only post step).
#
# Usage: ./make_video.sh <input_pattern> <output_file> [fps] [height] [width] [crf]
#   input_pattern  printf-style frame pattern, e.g. "vis/frame_%05d.jpg"
#   output_file    e.g. out.mp4
#   fps            default 30
#   height/width   default -1; -1 auto-computes that side from the aspect
#                  ratio. Output dimensions are always forced even (yuv420p).
#   crf            default 18 (0-51, lower = higher quality)
#
# Capability match for the reference's make_video.sh (ffmpeg/libx264 with an
# even-dimension scale filter); pure host post-processing.
set -eu

if [[ $# -lt 2 || $# -gt 6 ]]; then
  echo "Usage: $0 <input_pattern> <output_file> [fps] [height] [width] [crf]" >&2
  exit 1
fi

pattern=$1
out=$2
fps=${3:-30}
height=${4:--1}
width=${5:--1}
crf=${6:-18}

even() { printf 'ceil(%s/2)*2' "$1"; }

if [[ $height -eq -1 && $width -eq -1 ]]; then
  scale="scale=$(even iw):$(even ih)"
elif [[ $height -eq -1 ]]; then
  scale="scale=$(even "$width"):-2"
elif [[ $width -eq -1 ]]; then
  scale="scale=-2:$(even "$height")"
else
  scale="scale=$(even "$width"):$(even "$height")"
fi

exec ffmpeg -hide_banner -loglevel error \
  -framerate "$fps" \
  -i "$pattern" \
  -vf "$scale" \
  -c:v libx264 -pix_fmt yuv420p -crf "$crf" \
  "$out"

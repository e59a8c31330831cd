# Runtime environment for depth-completion-tpu (capability match for the
# reference's Docker layer; targets TPU VMs instead of NVIDIA hosts).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make ffmpeg libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace

COPY pyproject.toml README.md ./
COPY depth_completion_tpu ./depth_completion_tpu
COPY native ./native
COPY make_video.sh bench.py ./

# TPU wheels: libtpu comes with the jax[tpu] extra on TPU VMs.
RUN pip install --no-cache-dir "jax[tpu]" -f \
        https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .

COPY scripts/warm_cache.py ./scripts/warm_cache.py

# Cold-start: the 50-step sampling program takes minutes to compile per
# (geometry, batch, config) signature. Mount a persistent volume at
# JAX_COMPILATION_CACHE_DIR and prime it ON THE TARGET TPU VM (compiled
# programs are chip- and worker-specific, so priming cannot happen at
# image-build time — no TPU is attached here):
#
#   docker run -e JAX_COMPILATION_CACHE_DIR=/cache -v dct-cache:/cache \
#       --entrypoint python IMAGE scripts/warm_cache.py
#
# After priming, every dct-predict/dct-serve start on that VM deserializes
# from the volume in seconds instead of recompiling (PERF.md cold-start).
ENV JAX_COMPILATION_CACHE_DIR=/cache
VOLUME /cache

ENTRYPOINT ["dct-predict"]

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

ENTRYPOINT ["dct-predict"]

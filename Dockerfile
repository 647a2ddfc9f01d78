# Container recipe (C31 parity: the reference ships a CUDA-11.8 Dockerfile +
# docker-compose exposing the find_objects API on 8005). This image targets
# Cloud TPU VMs: libtpu comes in via the jax[tpu] extra; on a non-TPU host
# JAX falls back to CPU (tests + serving still run).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        libgl1 libglib2.0-0 g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/legslam_tpu
COPY pyproject.toml README.md ./
COPY legslam_tpu ./legslam_tpu
COPY cfg ./cfg
COPY tools ./tools
COPY native ./native
COPY bench.py ./

# build the native tracking kernels (the frontend hot path; the reference
# ships its full native stack in-container too). -march=native is dropped
# for image portability.
RUN g++ -O3 -shared -fPIC native/tracking_core.cpp \
        -o native/libtracking_core.so

RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax
RUN pip install --no-cache-dir .[cv,serve,eval]

ENV LEGSLAM_NATIVE_DIR=/opt/legslam_tpu/native
ENV LEGSLAM_NATIVE_TRACKING=1

EXPOSE 8005
# the reference compose runs the find_objects API (find_objects_api.py)
CMD ["python", "-m", "legslam_tpu.serving.api", "--port", "8005"]

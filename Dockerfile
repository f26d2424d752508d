# TPU-native optical-flow extractor container.
# Mirrors the reference's container contract (Dockerfile_optical_flow:1-17):
# mount data under /data, ENTRYPOINT is the extractor CLI with the same
# positional/flag arguments.
#
#   docker build -t optical_flow_tpu:0.1 .
#   docker run -v /my/corpus:/data optical_flow_tpu:0.1 /data vid1 vid2
FROM python:3.12-slim

ENV DEBIAN_FRONTEND=noninteractive

# native decode/encode runtime build deps (libav + libjpeg; libjpeg-dev
# resolves to libjpeg62-turbo-dev on the Debian base of python:3.12-slim)
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make pkg-config \
        libavformat-dev libavcodec-dev libavutil-dev libswscale-dev \
        libjpeg-dev \
    && rm -rf /var/lib/apt/lists/*

COPY requirements.txt /opt/app/requirements.txt
RUN pip3 install --no-cache-dir -r /opt/app/requirements.txt

COPY optical_flow_tpu /opt/app/optical_flow_tpu
COPY native /opt/app/native
RUN make -C /opt/app/native

ENV PYTHONPATH=/opt/app
VOLUME "/data"
WORKDIR /opt/app

ENTRYPOINT ["python3", "-m", "optical_flow_tpu.cli.optical_flow"]

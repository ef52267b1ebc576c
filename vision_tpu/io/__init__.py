from vision_tpu.io.image import (
    ImageReadMode,
    decode_gif,
    decode_image,
    decode_jpeg,
    decode_png,
    decode_png16,
    decode_webp,
    encode_jpeg,
    encode_png,
    read_file,
    read_image,
    write_file,
    write_jpeg,
    write_png,
)
from vision_tpu.io.jpeg_tpu import decode_jpeg_batch_tpu
from vision_tpu.io.prefetch import PrefetchIterator, decode_batch, prefetch_to_device
from vision_tpu.io.tpu_loader import TpuJpegLoader
from vision_tpu.io.image import decode_avif, decode_heic
from vision_tpu.io.video import (
    Timebase,
    VideoMetaData,
    VideoReader,
    read_video,
    read_video_timestamps,
    video_backend_available,
    write_video,
)

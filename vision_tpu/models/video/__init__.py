from vision_tpu.models.video.resnet import (
    MC3_18_Weights,
    R2Plus1D_18_Weights,
    R3D_18_Weights,
    VideoResNet,
    mc3_18,
    r2plus1d_18,
    r3d_18,
)
from vision_tpu.models.video.s3d import S3D, S3D_Weights, s3d

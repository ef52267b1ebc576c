from vision_tpu.models.optical_flow.raft import RAFT, Raft_Large_Weights, raft_large

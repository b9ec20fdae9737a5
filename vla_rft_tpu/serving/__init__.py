from vla_rft_tpu.serving.action_server import (  # noqa: F401
    ActionServer,
    decode_payload,
    encode_payload,
    get_action_from_server,
)

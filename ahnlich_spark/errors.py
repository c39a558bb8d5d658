"""Engine errors mirroring the reference's ServerError surface
(reference: ahnlich/db/src/errors.rs)."""


class AhnlichError(Exception):
    """Base class for all engine errors."""


class StoreNotFound(AhnlichError):
    pass


class StoreAlreadyExists(AhnlichError):
    pass


class SchemaNotFound(AhnlichError):
    pass


class StoreHasDependentViews(AhnlichError):
    """Dropping a store that managed materialized views still fold
    from would strand the views (every later refresh raises
    StoreNotFound while the catalog entry dangles); drop the views
    first or pass ``cascade_views=True``."""


class SchemaNotEmptyOrProtected(AhnlichError):
    """Dropping the default ``public`` schema is forbidden
    (reference: ahnlich/db/src/engine/store.rs:718-724)."""


class DimensionMismatch(AhnlichError):
    """Vector length != store dimension
    (reference: ahnlich/db/src/engine/store.rs:822-838)."""


class NonLinearIndexNotFound(AhnlichError):
    """KdTree/Hnsw query without the index created
    (reference: ahnlich/db/src/engine/store.rs:324-326)."""


class PredicateIndexNotFound(AhnlichError):
    pass


class UpsertMatchError(AhnlichError):
    """Upsert requires exactly one matching row
    (reference: ahnlich/db/src/engine/store.rs:443-528)."""


class ReservedKeyError(AhnlichError):
    """User supplied the reserved AI metadata key
    (reference: ahnlich/ai/src/engine/store.rs:305-347)."""


class InputTypeMismatch(AhnlichError):
    """AI store input kind does not match the model's input type."""


class TokenExceeded(AhnlichError):
    """Input exceeds the model's token budget under NoPreprocessing
    (reference: AIProxyError::TokenExceededError,
    ahnlich/ai/src/error.rs:40, raised at ai/src/manager/mod.rs:204-207)."""


class DslSyntaxError(AhnlichError):
    """``span`` carries the (start, end) byte offsets of the offending
    region within the original query string, mirroring the reference's
    ``DslError::UnexpectedSpan`` (ahnlich/dsl/src/error.rs): a statement
    that fails to parse spans its whole ``;``-segment (pest's
    invalid_statement catch-all), trailing junk after a valid statement
    spans from the last matched token to the segment end."""

    def __init__(self, msg: str, span=None):
        super().__init__(msg)
        self.span = span


class ImageDimensionsMismatch(AhnlichError):
    """Image dims != the model's expected dims under NoPreprocessing
    (reference: AIProxyError::ImageDimensionsMismatchError,
    ai/src/manager/mod.rs:305-311)."""


class PreprocessingRequired(AhnlichError):
    """The model's pipeline cannot run on raw inputs — NoPreprocessing
    is rejected (reference: FaceModelNoPreprocessingError for face
    models, AudioNoPreprocessingError for CLAP audio;
    ai/src/manager/mod.rs:160-175, 284-297)."""


class MaxClientsReached(AhnlichError):
    """The warehouse's client limit is exhausted (reference
    --maximum-clients, default 512: excess connections are refused,
    utils/src/cli.rs:117, server_tests
    test_maximum_client_restriction_works)."""


class AmbiguousFaceQuery(AhnlichError):
    """A similarity QUERY through a one-to-many (face) model must
    contain exactly one face — multiple detections make the query
    embedding ambiguous and are rejected rather than silently picking
    one (reference buffalo_l_test.rs
    test_buffalo_l_get_sim_n_multi_face_query_errors)."""


class AudioTooLong(AhnlichError):
    """The audio clip exceeds the model's duration limit (reference:
    CLAP rejects inputs over 10000ms with 'Audio input is too long',
    clap_test.rs test_clap_audio_too_long_rejected)."""

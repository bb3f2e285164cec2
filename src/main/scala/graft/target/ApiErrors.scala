package graft.target

/** Typed HTTP error taxonomy for the API sink — the Spark-side analog of the
  * reference's exception surface (target-pendo/src/request.py:34-80
  * raise_errors_on_failure and target-pendo/src/exceptions.py): callers can
  * catch/branch on the error *class*, not a bare status int.
  *
  * All errors are Serializable (they may cross the executor→driver boundary
  * inside task failures or accumulators).
  */
sealed abstract class ApiError(val status: Int, message: String)
    extends RuntimeException(message) with Serializable

object ApiError {

  /** 400 — malformed request body (exceptions.py BadRequestError). */
  final class BadRequest(message: String = "Bad Request")
      extends ApiError(400, message)

  /** 401/403 — bad or insufficient credentials (request.py:80-84,
    * exceptions.py AuthenticationError covers both). */
  final class Authentication(override val status: Int, message: String)
      extends ApiError(status, message)

  /** 404 (request.py:78-79 ResourceNotFound). */
  final class ResourceNotFound(message: String = "Resource Not Found")
      extends ApiError(404, message)

  /** 429 — rate limited; retryable with backoff (the reference backs off on
    * RateLimitException, request.py:34-36). Carries the server's Retry-After
    * hint when present. */
  final class RateLimited(val retryAfterMillis: Option[Long])
      extends ApiError(429, "Rate Limit Exceeded")

  /** 500 (request.py:85-86 ServerError). */
  final class Server(message: String = "Server Error")
      extends ApiError(500, message)

  /** 502 (request.py:87-88 BadGatewayError). */
  final class BadGateway(message: String = "Bad Gateway Error")
      extends ApiError(502, message)

  /** 503 (request.py:89-90 ServiceUnavailableError). */
  final class ServiceUnavailable(message: String = "Service Unavailable")
      extends ApiError(503, message)

  /** Anything else non-2xx (exceptions.py HttpError catch-all). */
  final class Http(override val status: Int)
      extends ApiError(status, s"HTTP $status")

  /** Map a status (+ optional Retry-After) to its typed error — the
    * raise_errors_on_failure dispatch table as a total function. */
  def of(status: Int, retryAfterMillis: Option[Long] = None): ApiError =
    status match {
      case 400        => new BadRequest()
      case 401        => new Authentication(401, "Unauthorized")
      case 403        => new Authentication(403, "Forbidden")
      case 404        => new ResourceNotFound()
      case 429        => new RateLimited(retryAfterMillis)
      case 500        => new Server()
      case 502        => new BadGateway()
      case 503        => new ServiceUnavailable()
      case s          => new Http(s)
    }

  /** Retryable = transient: timeouts, rate limits, server errors. 4xx other
    * than 408/429 is a permanent client error → give up immediately
    * (__init__.py:284-285 exception_is_4xx giveup; 429 is excluded from the
    * giveup set because the reference's whole retry loop exists to absorb
    * rate-limit errors). */
  def retryable(status: Int): Boolean =
    status == 408 || status == 429 || status < 400 || status >= 500
}

package graft

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import graft.sources.{PagedRestSource, TokenAuth}
import graft.sources.PagedRestSource.Page
import graft.sources.TokenAuth.{CredentialProvider, Token}

/** Expiring-credential lifecycle (the reference's auth.py contract)
  * against a fake clock and token endpoint: refresh-before-expiry,
  * single-flight refresh under concurrency, bounded-retry failure
  * surfacing, restart-surviving persisted artifact, and the 401
  * invalidate → refreshed-retry path through the authed pager. */
class TokenAuthSpec extends SparkTestBase {

  /** Fake endpoint minting tok-1, tok-2, … each valid 1000 s. */
  private def endpoint(clock: AtomicLong, calls: AtomicInteger,
      failFirst: Int = 0): Option[Token] => Token = { prior =>
    val n = calls.incrementAndGet()
    if (n <= failFirst) throw new java.io.IOException(s"endpoint down (call $n)")
    Token(s"tok-$n", s"ref-$n", clock.get() + 1000L)
  }

  test("refresh-before-expiry: a token inside the skew margin refreshes early") {
    val clock = new AtomicLong(1000L)
    val calls = new AtomicInteger(0)
    val p = new CredentialProvider(endpoint(clock, calls), () => clock.get(),
      refreshSkew = 60L)
    assert(p.validToken().accessToken == "tok-1")
    assert(p.validToken().accessToken == "tok-1", "fresh token reused")
    clock.set(1900L) // 100 s of validity left — outside the 60 s skew
    assert(p.validToken().accessToken == "tok-1")
    clock.set(1941L) // 59 s left — INSIDE the skew: must refresh early
    assert(p.validToken().accessToken == "tok-2")
    assert(calls.get() == 2)
  }

  test("single-flight: concurrent callers on a stale token trigger exactly one refresh") {
    val clock = new AtomicLong(0L)
    val calls = new AtomicInteger(0)
    val slowEndpoint: Option[Token] => Token = { _ =>
      val n = calls.incrementAndGet()
      Thread.sleep(50) // widen the race window
      Token(s"tok-$n", s"ref-$n", clock.get() + 1000L)
    }
    val p = new CredentialProvider(slowEndpoint, () => clock.get())
    val results = (1 to 8).map { _ =>
      val t = new java.util.concurrent.FutureTask(
        () => p.validToken().accessToken)
      new Thread(t).start(); t
    }.map(_.get())
    assert(calls.get() == 1, s"expected ONE refresh, endpoint saw ${calls.get()}")
    assert(results.toSet == Set("tok-1"), "every caller got the single refresh's token")
  }

  test("refresh failure surfaces AuthException after the bounded attempt budget") {
    val clock = new AtomicLong(0L)
    val calls = new AtomicInteger(0)
    // endpoint fails EVERY call: budget must exhaust into AuthException
    val dead: Option[Token] => Token =
      _ => { calls.incrementAndGet(); throw new java.io.IOException("down") }
    val p = new CredentialProvider(dead, () => clock.get(), maxAttempts = 3)
    intercept[TokenAuth.AuthException] { p.validToken() }
    assert(calls.get() == 3, "exactly maxAttempts total attempts")
    // transient outage: 2 failures then success stays within the budget
    val calls2 = new AtomicInteger(0)
    val p2 = new CredentialProvider(endpoint(clock, calls2, failFirst = 2),
      () => clock.get(), maxAttempts = 3)
    assert(p2.validToken().accessToken == "tok-3")
  }

  test("persisted token survives a restart; cold start with a live artifact never hits the endpoint") {
    val store = Files.createTempDirectory("token-store").toString
    val clock = new AtomicLong(5000L)
    val calls = new AtomicInteger(0)
    val p1 = new CredentialProvider(endpoint(clock, calls), () => clock.get(),
      storePath = Some(store))
    assert(p1.validToken().accessToken == "tok-1")
    // "restart": a NEW provider over the same store, endpoint now dead —
    // the persisted unexpired token must be reused without any call
    val dead: Option[Token] => Token =
      _ => throw new IllegalStateException("endpoint must not be called")
    val p2 = new CredentialProvider(dead, () => clock.get(),
      storePath = Some(store))
    val t = p2.validToken()
    assert(t.accessToken == "tok-1" && t.refreshToken == "ref-1" &&
      t.expiresAt == 6000L)
    // once the persisted token ages past its expiry, the restart path
    // refreshes (with the PRIOR token available for its refresh grant)
    val clock2 = new AtomicLong(7000L)
    val grants = new AtomicInteger(0)
    val granting: Option[Token] => Token = { prior =>
      assert(prior.exists(_.refreshToken == "ref-1"),
        "refresh grant must carry the persisted prior token")
      grants.incrementAndGet()
      Token("tok-next", "ref-next", clock2.get() + 1000L)
    }
    val p3 = new CredentialProvider(granting, () => clock2.get(),
      storePath = Some(store))
    assert(p3.validToken().accessToken == "tok-next" && grants.get() == 1)
    // ...and the refreshed token was itself persisted
    val p4 = new CredentialProvider(dead, () => clock2.get(),
      storePath = Some(store))
    assert(p4.validToken().accessToken == "tok-next")
    // crash INSIDE the swap (after delete, before rename): only the
    // fully-written .tmp exists — recovery must read it, not refresh
    val dir = java.nio.file.Paths.get(store)
    java.nio.file.Files.move(dir.resolve("token.properties"),
      dir.resolve("token.properties.tmp"))
    val p5 = new CredentialProvider(dead, () => clock2.get(),
      storePath = Some(store))
    assert(p5.validToken().accessToken == "tok-next")
    // a TORN tmp (crash mid-write, no main artifact) must fall through
    // to a clean refresh, not crash recovery
    java.nio.file.Files.write(dir.resolve("token.properties.tmp"),
      "access_token=half\nexpires_at=not-a-number".getBytes)
    val grants2 = new AtomicInteger(0)
    val p6 = new CredentialProvider(
      _ => { grants2.incrementAndGet(); Token("tok-clean", "r", clock2.get() + 1000L) },
      () => clock2.get(), storePath = Some(store))
    assert(p6.validToken().accessToken == "tok-clean" && grants2.get() == 1)
    // a torn tmp holding a parseable expires_at but NO access_token
    // (Properties.store writes keys in unspecified order, so a
    // truncation can keep either line) must also fall through to a
    // refresh — never serve Token(null, ...) as a live credential
    java.nio.file.Files.deleteIfExists(dir.resolve("token.properties"))
    java.nio.file.Files.write(dir.resolve("token.properties.tmp"),
      s"expires_at=${clock2.get() + 999}\n".getBytes)
    val grants3 = new AtomicInteger(0)
    val p7 = new CredentialProvider(
      _ => { grants3.incrementAndGet(); Token("tok-clean2", "r", clock2.get() + 1000L) },
      () => clock2.get(), storePath = Some(store))
    assert(p7.validToken().accessToken == "tok-clean2" && grants3.get() == 1)
  }

  test("401 path through the authed pager: rejected token invalidates, retry refreshes, extraction completes") {
    val landing = Files.createTempDirectory("authed-landing").toString + "/raw"
    val clock = new AtomicLong(0L)
    val calls = new AtomicInteger(0)
    val creds = new CredentialProvider(endpoint(clock, calls), () => clock.get())
    // the server REVOKES tok-1 while page 5 is in flight: clock-fresh
    // but rejected — only the refreshed tok-2 passes from then on
    val fetch: (Option[String], Token) => Page = { (cursor, tok) =>
      val p = cursor.map(_.toInt).getOrElse(0)
      if (p >= 5 && tok.accessToken == "tok-1")
        throw new TokenAuth.AuthException("401: token revoked")
      Page(Seq(s"""{"p":$p,"tok":"${tok.accessToken}"}"""),
        if (p < 9) Some((p + 1).toString) else None)
    }
    val (pages, rows) = PagedRestSource.fetchToLandingAuthed(
      spark, fetch, creds, landing)
    assert(pages == 10L && rows == 10L)
    assert(calls.get() == 2, "exactly one re-refresh after the revocation")
    val payloads = PagedRestSource.readLanding(spark, landing)
      .collect().map(_.getAs[String]("payload")).toSet
    assert(payloads.count(_.contains("tok-1")) == 5 &&
      payloads.count(_.contains("tok-2")) == 5)
  }

  test("hmac request signing is deterministic and key-sensitive (RFC 4231 vector)") {
    // RFC 4231 test case 2: key "Jefe", data "what do ya want for nothing?"
    assert(TokenAuth.hmacSha256Hex("Jefe", "what do ya want for nothing?") ==
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
    assert(TokenAuth.hmacSha256Hex("other", "what do ya want for nothing?") !=
      TokenAuth.hmacSha256Hex("Jefe", "what do ya want for nothing?"))
  }
}
